package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.GraftTable

/** The version-tick refresh skeleton's delta path (VERDICT r14 #4):
  * append-only ticks must flow through applyDelta at ∝-delta cost
  * (never re-reading the corpus), the operator's None must fold via a
  * full rebuild, and delete ticks must always take the full path —
  * with results identical to a full rebuild at every step. */
class RefreshableStaticSpec extends SparkSpec {

  test("append ticks delta-merge (work proportional to delta), None folds, deletes full-rebuild; results always equal the table") {
    import spark.implicits._
    val loc = tmpDir("refstatic") + "/t"
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))))
    t.append((0L until 100L).map(i => (i, i * 10)).toDF("id", "v"))

    var builds = 0
    var deltas = 0
    var depth = 0
    val rs = new RefreshableStatic[DataFrame](loc,
      build = df => { builds += 1; depth = 0; df.localCheckpoint(true) },
      release = _ => (),
      applyDelta = Some((cur, d, _) => {
        deltas += 1
        if (depth >= 2) None // the operator's stack-depth fold bound
        else { depth += 1; Some(cur.unionByName(d.localCheckpoint(true))) }
      }))

    def sorted(df: DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def expect() = sorted(GraftTable.open(spark, loc).read())

    assert(sorted(rs.get(spark)) === expect())
    assert(builds === 1 && deltas === 0, "first get is the one full build")

    // input-records listener: a delta tick must read ∝ delta (the
    // appended file once, for the merge — the append-only gate reads
    // only history metadata), never the 100-row corpus
    val records = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            records.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      })

    t.append(Seq((100L, 1000L), (101L, 1010L)).toDF("id", "v"))
    records.set(0L)
    val afterDelta = rs.get(spark)
    Thread.sleep(1000) // listener bus drains asynchronously
    assert(builds === 1 && deltas === 1, "an append tick must delta-merge")
    assert(records.get() < 20L,
      s"a 2-row delta tick read ${records.get()} records — it must not " +
        "re-read the 100-row corpus")
    assert(sorted(afterDelta) === expect(), "delta merge ≡ full rebuild")

    t.append(Seq((102L, 1020L)).toDF("id", "v"))
    assert(sorted(rs.get(spark)) === expect())
    assert(builds === 1 && deltas === 2, "second append still delta-merges")

    t.append(Seq((103L, 1030L)).toDF("id", "v"))
    records.set(0L)
    assert(sorted(rs.get(spark)) === expect())
    Thread.sleep(1000)
    assert(builds === 2 && deltas === 3,
      "the operator's None (depth cap) must fold via a full rebuild")
    assert(records.get() >= 100L, "the fold re-reads the corpus")

    // a DELETE tick changes files/vectors: the metadata gate must
    // reject the delta path and the full rebuild must run
    t.delete(Seq(org.apache.spark.sql.sources.EqualTo("id", 0L)))
    assert(sorted(rs.get(spark)) === expect())
    assert(builds === 3, "a delete tick must full-rebuild")
    assert(!sorted(rs.get(spark)).exists(_._1 == 0L))

    // a COMPACTION tick (files replaced, rows identical) must take the
    // full path — the metadata gate sees the removed files without
    // scanning the feed (whose diff is EMPTY at full-scan cost)
    assert(t.compactSmall(1L << 30, 1L << 30) > 0, "fold must have work")
    assert(sorted(rs.get(spark)) === expect())
    assert(builds === 4, "a compaction tick must full-rebuild")

    // no tick → no work, same instance
    val same = rs.get(spark)
    assert(builds === 4 && (same eq rs.get(spark)))
    rs.close()
    GraftTable.drop(loc)
  }

  test("an expired change range falls back to the full rebuild instead of failing the stream") {
    import spark.implicits._
    val loc = tmpDir("refstatic-exp") + "/t"
    val t = GraftTable.create(spark, loc, StructType(Seq(
      StructField("id", LongType), StructField("v", LongType))))
    t.append(Seq((1L, 10L)).toDF("id", "v"))
    var builds = 0
    val rs = new RefreshableStatic[DataFrame](loc,
      build = df => { builds += 1; df.localCheckpoint(true) },
      release = _ => (),
      applyDelta = Some((cur, d, _) => Some(cur.unionByName(d.localCheckpoint(true)))))
    assert(rs.get(spark).count() === 1L)
    // two appends, then expire the history the feed would need
    t.append(Seq((2L, 20L)).toDF("id", "v"))
    t.append(Seq((3L, 30L)).toDF("id", "v"))
    t.expireHistory(keepLast = 1)
    assert(rs.get(spark).count() === 3L,
      "an unreadable change range must serve the full rebuild")
    assert(builds === 2)
    rs.close()
    GraftTable.drop(loc)
  }
}
