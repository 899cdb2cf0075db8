package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** c1 stratified sampling: the two-phase (salted) quota must be row-for-
  * row identical to the naive single-window formulation — the salting
  * changes shuffle geometry only — plus quota and determinism checks. */
class SamplingSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("two-phase salted quota == single-phase window (any salt count)") {
    val singlePhase = {
      val keyed = Tables.load(spark, dir, "documents").select(
        col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("sk"))
      keyed.withColumn("rn",
        row_number().over(Window.partitionBy("lang").orderBy(col("sk"), col("doc_id"))))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("doc_id"), col("rn").cast("long").as("rk"))
    }
    for (salts <- Seq(1, 7, 16)) {
      val twoPhase = Sampling.c1StratifiedSample(spark, dir, perStratum = 20, salts = salts)
      assert(twoPhase.exceptAll(singlePhase).isEmpty &&
        singlePhase.exceptAll(twoPhase).isEmpty,
        s"two-phase(salts=$salts) must equal the single-phase window")
    }
  }

  test("quota: min(perStratum, stratum size) per stratum; deterministic") {
    val quota = 30
    val out = Sampling.c1StratifiedSample(spark, dir, perStratum = quota)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = Tables.load(spark, dir, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got(lang) === math.min(quota.toLong, n), s"quota for $lang")
    }
    // deterministic: same rows on a re-run
    val again = Sampling.c1StratifiedSample(spark, dir, perStratum = quota)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }
}
