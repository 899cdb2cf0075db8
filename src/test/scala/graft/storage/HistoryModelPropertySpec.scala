package graft.storage

import org.apache.spark.sql.sources.In
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized model check of the VERSIONED machinery: a seeded stream
  * of appends, copy-on-write deletes, merge-on-read deletes/updates,
  * compactions, and restores runs against a graft table while an
  * in-memory model records the state AT EVERY COMMITTED VERSION. After
  * every operation the live table must equal the model's current state;
  * at the end, every retained snapshot must read back as exactly the
  * state the model recorded for it — time travel, restore, deletion
  * vectors, and compaction composing over one another. */
class HistoryModelPropertySpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", LongType)))

  private def runSeed(seed: Long): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val t = GraftTable.create(spark, tmpDir(s"hist-model-$seed") + "/t", schema,
      GraftTableOptions(sortBy = Seq("id")))
    var cur = Map[Int, Long]()
    val states = scala.collection.mutable.Map[Long, Map[Int, Long]](0L -> cur)
    var nextKey = 0

    def record(): Unit = states(t.version) = cur
    def sampleKeys(n: Int): Seq[Int] =
      rnd.shuffle(cur.keys.toVector.sorted).take(n)

    for (round <- 1 to 14) {
      rnd.nextInt(6) match {
        case 0 | 1 => // append a fresh batch (ids strictly increasing)
          val rows = (0 until 5 + rnd.nextInt(10)).map { _ =>
            nextKey += 1; (nextKey, rnd.nextLong())
          }
          t.append(rows.toDF("id", "v"))
          cur ++= rows
          record()
        case 2 => // copy-on-write delete of sampled present keys
          val ks = sampleKeys(1 + rnd.nextInt(4))
          if (ks.nonEmpty) {
            val n = t.delete(Seq(In("id", ks.map(Integer.valueOf).toArray[Any])))
            assert(n === ks.size.toLong, s"seed=$seed round=$round COW delete count")
            cur --= ks
            record()
          }
        case 3 => // merge-on-read delete
          val ks = sampleKeys(1 + rnd.nextInt(4))
          if (ks.nonEmpty) {
            val n = t.deleteMor(Seq(In("id", ks.map(Integer.valueOf).toArray[Any])))
            assert(n === ks.size.toLong, s"seed=$seed round=$round MOR delete count")
            cur --= ks
            record()
          }
        case 4 => // merge-on-read update (+1000 on sampled keys)
          val ks = sampleKeys(1 + rnd.nextInt(3))
          if (ks.nonEmpty) {
            val n = t.updateMor(Map("v" -> (col("v") + lit(1000L))),
              Seq(In("id", ks.map(Integer.valueOf).toArray[Any])))
            assert(n === ks.size.toLong, s"seed=$seed round=$round MOR update count")
            cur = cur ++ ks.map(k => k -> (cur(k) + 1000L))
            record()
          }
        case 5 => // restore to a random RECORDED version, or compact
          if (rnd.nextBoolean() && states.size > 1) {
            val v = states.keys.toVector.sorted.apply(
              rnd.nextInt(states.size))
            t.restore(v)
            cur = states(v)
            record()
          } else {
            if (t.compactSmall(smallBytes = 64L << 20) > 0) record()
          }
      }
      val got = t.read().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got === cur, s"seed=$seed round=$round live state diverged")
      assert(t.rowCountFromMetadata() === cur.size.toLong,
        s"seed=$seed round=$round metadata row count")
    }
    // every retained snapshot reads back as the state the model recorded
    val retained = t.history().map(_._1).filter(states.contains)
    assert(retained.nonEmpty)
    retained.foreach { v =>
      val snap = t.readVersion(v).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(snap === states(v), s"seed=$seed snapshot v$v diverged")
    }
    GraftTable.drop(t.location)
  }

  test("versioned table ≡ model across random mutations and restores (seed 7)") {
    runSeed(7L)
  }
  test("versioned table ≡ model across random mutations and restores (seed 99)") {
    runSeed(99L)
  }
}
