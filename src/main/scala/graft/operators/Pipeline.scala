package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** p1: composed corpus-cleaning pipeline — the end-to-end shape of a
  * training-data preparation job, as one declarative plan:
  *
  *   1. near-dup removal: n-gram Jaccard ≥ 0.8 pairs (inverted-index
  *      join, as d2), drop the higher doc_id of each pair
  *   2. quality gate: ≥ 10 tokens and quality score ≥ 0.1 (t2 formula)
  *   3. annotation: language ID (t3 profiles)
  *
  * Everything stays inside Catalyst — the dedup victims come from a
  * left-anti join, so the pipeline is shuffles-on-keys only and scales
  * like its components. Oracle replicates all three stages. */
object Pipeline {

  def p1CleanCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // Shares d2's materialized pair cache: a run that executes both d2
    // and p1 computes the two dedup shuffles once, not twice.
    val victims = Dedup.ngramPairsCached(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val stopCnt = size(filter(toks, t =>
      Seq("the", "a", "of", "and", "to").map(w => t === w).reduce(_ || _))).cast("long")
    val stopRatio = stopCnt.cast("double") / nTok.cast("double")
    val quality = least(lit(1.0), nTok.cast("double") / 100.0) * (lit(1.0) - stopRatio)
    def hits(words: Seq[String]) =
      size(filter(toks, t => words.map(w => t === w).reduce(_ || _))).cast("long")
    val en = hits(Seq("the", "a", "of"))
    val de = hits(Seq("der", "die", "und"))
    val fr = hits(Seq("le", "la", "et"))
    val es = hits(Seq("el", "los", "y"))
    val lang = when(en > 0 && en >= de && en >= fr && en >= es, "en")
      .when(de > 0 && de >= fr && de >= es, "de")
      .when(fr > 0 && fr >= es, "fr")
      .when(es > 0, "es")
      .otherwise("und")
    docs
      .join(victims, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), nTok.as("n_tok"),
        round(quality, 4).as("quality"), lang.as("lang_pred"))
      .filter(col("n_tok") >= 10 && col("quality") >= 0.1)
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_clean_corpus" -> p1CleanCorpus _,
  )

  import OracleSql._

  private def hitsSql(words: Seq[String]): String =
    s"len(list_filter(toks, t -> ${words.map(w => s"t = '$w'").mkString(" OR ")}))"

  val oracles: Map[String, String] = Map(
    "p1_clean_corpus" ->
      (s"""WITH $shingleCte,
         |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
         |cm AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) common
         |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2),
         |victims AS (SELECT DISTINCT doc_b AS doc_id FROM cm
         |  JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
         |  WHERE CAST(common AS DOUBLE)/CAST(ca.n+cb.n-common AS DOUBLE) >= 0.8),
         |feat AS (SELECT d.doc_id, string_split(d.text, ' ') toks FROM documents d
         |  WHERE d.doc_id NOT IN (SELECT doc_id FROM victims)),
         |scored AS (SELECT doc_id, len(toks) n_tok,
         |    least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) *
         |      (1.0 - CAST(${hitsSql(Seq("the", "a", "of", "and", "to"))} AS DOUBLE)
         |        / CAST(len(toks) AS DOUBLE)) q,
         |    ${hitsSql(Seq("the", "a", "of"))} en,
         |    ${hitsSql(Seq("der", "die", "und"))} de,
         |    ${hitsSql(Seq("le", "la", "et"))} fr,
         |    ${hitsSql(Seq("el", "los", "y"))} es
         |  FROM feat)
         |SELECT doc_id, n_tok, round(q, 4) quality,
         |  CASE WHEN en > 0 AND en >= de AND en >= fr AND en >= es THEN 'en'
         |       WHEN de > 0 AND de >= fr AND de >= es THEN 'de'
         |       WHEN fr > 0 AND fr >= es THEN 'fr'
         |       WHEN es > 0 THEN 'es'
         |       ELSE 'und' END lang_pred
         |FROM scored WHERE n_tok >= 10 AND round(q, 4) >= 0.1
         |ORDER BY doc_id""".stripMargin),
  )
}
