package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation sampling operators for training-data pipelines.
  *
  * Stratified sampling is the standard first step of corpus curation:
  * fix a per-stratum quota (per language, per source, per domain) so
  * the sampled corpus follows a target mix instead of the crawl's. The
  * selection must be DETERMINISTIC — re-running curation on the same
  * corpus must pick the same documents (reproducible datasets, stable
  * lineage) — so rows are ranked inside each stratum by a cryptographic
  * hash of the row key (md5 of doc_id), not by a random() that varies
  * per run and per executor.
  *
  * 100 TB design: a single `row_number() OVER (PARTITION BY stratum)`
  * shuffles the WHOLE corpus into one task per stratum — with a handful
  * of languages that is a handful of tasks for 100 TB. Instead the
  * quota is taken in two phases: phase 1 ranks within (stratum, salt)
  * — `salts`-way parallel, each task sees ~1/salts of the data and
  * keeps at most `perStratum` rows — and phase 2 re-ranks only the
  * surviving `salts * perStratum` rows per stratum. The global top-N
  * within a stratum is a subset of the union of per-salt top-Ns (each
  * globally-chosen row is also in its own salt's top-N), so the result
  * is IDENTICAL to the single-phase window; only the shuffle geometry
  * changes. The oracle is the single-phase formulation.
  */
object Sampling {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** c1: deterministic stratified sample — `perStratum` docs per
    * language, ranked by md5(doc_id). */
  def c1StratifiedSample(s: SparkSession, dir: String,
      perStratum: Int = 20, salts: Int = 16): DataFrame = {
    val keyed = docs(s, dir).select(
      col("lang"), col("doc_id"),
      md5(col("doc_id").cast("string").cast("binary")).as("sk"),
      // phase-1 salt: any deterministic spread works, it never reaches
      // the result — Murmur3 hash of the key, not part of the oracle
      pmod(hash(col("doc_id")), lit(salts)).as("salt"))
    val phase1 = keyed
      .withColumn("rn",
        row_number().over(Window.partitionBy("lang", "salt")
          .orderBy(col("sk"), col("doc_id"))))
      .filter(col("rn") <= perStratum)
      .drop("rn", "salt")
    phase1
      .withColumn("rn",
        row_number().over(Window.partitionBy("lang")
          .orderBy(col("sk"), col("doc_id"))))
      .filter(col("rn") <= perStratum)
      .select(col("lang"), col("doc_id"), col("rn").cast("long").as("rk"))
      .orderBy("lang", "rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_stratified_sample" -> ((s, dir) => c1StratifiedSample(s, dir)),
  )

  val oracles: Map[String, String] = Map(
    "c1_stratified_sample" ->
      """WITH k AS (SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) sk
        |           FROM documents),
        |r AS (SELECT lang, doc_id,
        |        row_number() OVER (PARTITION BY lang ORDER BY sk, doc_id) rn
        |      FROM k)
        |SELECT lang, doc_id, rn AS rk FROM r WHERE rn <= 20
        |ORDER BY lang, rk""".stripMargin,
  )
}
