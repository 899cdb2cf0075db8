package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.storage.GraftTable

/** Incremental aggregate maintenance over the change data feed: the
  * maintained per-key (sum, cnt) table must equal a from-scratch
  * `GROUP BY` recompute of the source after ANY commit sequence —
  * appends, updates, deletes, tombstoned keys — and a checkpoint
  * restart must fold each commit exactly once (the additive merge is
  * NOT idempotent, so the txn watermark is load-bearing, not a
  * nicety). Values are integral-in-double so equality is exact. */
class GraftAggMaintainSpec extends SparkSpec {

  private def schema = StructType(Seq(
    StructField("k", LongType), StructField("grp", StringType),
    StructField("v", DoubleType)))

  private def recompute(loc: String) =
    GraftTable.open(spark, loc).read()
      .groupBy("grp").agg(sum("v").as("sum"), count(lit(1)).as("cnt"))

  private def drainOnce(src: String, tgt: String, ckpt: String): Unit = {
    val q = GraftAggMaintain.start(spark, src, tgt,
      Seq("grp"), "v", ckpt)
    assert(q.awaitTermination(120000), "maintenance drain must finish")
    assert(q.exception.isEmpty, q.exception.map(_.toString).getOrElse(""))
  }

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select("grp", "sum", "cnt").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

  test("maintained rollup equals recompute across append/update/delete commits") {
    import spark.implicits._
    val root = tmpDir("aggm")
    val src = s"$root/src"
    val tgt = s"$root/tgt"
    val ckpt = s"$root/ck"
    val t = GraftTable.create(spark, src, schema)
    t.append(Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 7.0)).toDF("k", "grp", "v"))
    drainOnce(src, tgt, ckpt)
    assert(asMap(GraftAggMaintain.read(spark, tgt)) ===
      Map("a" -> ((15.0, 2L)), "b" -> ((7.0, 1L))))

    // update folds to its value delta; delete subtracts; a fresh group appears
    t.update(Map("v" -> lit(20.0)),
      Seq(org.apache.spark.sql.sources.EqualTo("k", 2L)))
    t.delete(Seq(org.apache.spark.sql.sources.EqualTo("k", 3L)))
    t.append(Seq((4L, "c", 2.0), (5L, "b", 3.0)).toDF("k", "grp", "v"))
    drainOnce(src, tgt, ckpt)
    val expect = asMap(recompute(src))
    assert(asMap(GraftAggMaintain.read(spark, tgt)) === expect)
    assert(expect === Map("a" -> ((30.0, 2L)), "b" -> ((3.0, 1L)), "c" -> ((2.0, 1L))))
  }

  test("merge-on-read mutations fold exactly (vector commits swap no files)") {
    import spark.implicits._
    val root = tmpDir("aggm-mor")
    val src = s"$root/src"
    val tgt = s"$root/tgt"
    val ckpt = s"$root/ck"
    val t = GraftTable.create(spark, src, schema)
    t.append((1L to 20L).map(k =>
      (k, if (k % 2 == 0) "even" else "odd", k.toDouble)).toDF("k", "grp", "v"))
    drainOnce(src, tgt, ckpt)
    // vector-only delete, then a MOR update (vector + appended version):
    // both commits' diffs come from vectors, not swapped files — the
    // maintained rollup must still equal the recompute
    t.deleteMor(Seq(org.apache.spark.sql.sources.In("k", Array(2L, 4L))))
    t.updateMor(Map("v" -> lit(100.0)),
      Seq(org.apache.spark.sql.sources.EqualTo("k", 7L)))
    drainOnce(src, tgt, ckpt)
    val expect = asMap(recompute(src))
    assert(asMap(GraftAggMaintain.read(spark, tgt)) === expect)
    assert(expect("even")._2 === 8L)
    assert(expect("odd") === ((1L to 20L).filter(_ % 2 == 1)
      .map(_.toDouble).sum - 7.0 + 100.0, 10L))
  }

  test("a fully-deleted key tombstones out of the read view") {
    import spark.implicits._
    val root = tmpDir("aggm2")
    val src = s"$root/src"
    val t = GraftTable.create(spark, src, schema)
    t.append(Seq((1L, "only", 4.0), (2L, "keep", 1.0)).toDF("k", "grp", "v"))
    drainOnce(src, s"$root/tgt", s"$root/ck")
    t.delete(Seq(org.apache.spark.sql.sources.EqualTo("grp", "only")))
    drainOnce(src, s"$root/tgt", s"$root/ck")
    assert(asMap(GraftAggMaintain.read(spark, s"$root/tgt")) ===
      Map("keep" -> ((1.0, 1L))))
    // the tombstone row exists in storage (cnt = 0), excluded by read()
    val raw = GraftTable.open(spark, s"$root/tgt").read()
      .filter(col("grp") === "only").select("cnt").collect()
    assert(raw.map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("replayed micro-batch folds exactly once (txn watermark)") {
    import spark.implicits._
    val root = tmpDir("aggm3")
    val src = s"$root/src"
    val tgt = s"$root/tgt"
    val t = GraftTable.create(spark, src, schema)
    t.append(Seq((1L, "a", 1.0)).toDF("k", "grp", "v"))
    drainOnce(src, tgt, s"$root/ck")
    // simulate the crash-replay: re-run the SAME batch id by hand — the
    // additive merge would double the sum if the watermark didn't hold
    val tgtT = GraftTable.open(spark, tgt)
    val id = GraftAggMaintain.txnId(s"$root/ck")
    val replay = Seq(("a", 2.0, 2L)).toDF("grp", "sum", "cnt")
    val (u, i) = tgtT.mergeStream(replay, Seq("grp"), id, 0L)
    assert(u === 0L && i === 0L, "batch 0 was committed; its replay must no-op")
    assert(asMap(GraftAggMaintain.read(spark, tgt)) === Map("a" -> ((1.0, 1L))))
    // and new commits still fold
    t.append(Seq((2L, "a", 2.0)).toDF("k", "grp", "v"))
    drainOnce(src, tgt, s"$root/ck")
    assert(asMap(GraftAggMaintain.read(spark, tgt)) === Map("a" -> ((3.0, 2L))))
  }
}
