package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{SparkSpec, Tables}
import graft.functions.PolyHash.polyHashFast
import graft.functions.TextFunctions._

/** The codegen'd PolyHash must agree exactly with the interpreted HOF
  * fold (which the DuckDB oracles replicate) — on the corpus and on
  * generated ASCII strings. */
class PolyHashSpec extends SparkSpec {

  test("PolyHash == HOF polyHash on the documents corpus (both primes)") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    for (p <- Seq(P31, P57)) {
      val diff = docs.select(
        polyHashFast(col("text"), p).as("fast"),
        polyHash(col("text"), p).as("slow"))
        .filter(col("fast") =!= col("slow"))
        .count()
      assert(diff === 0, s"mismatch for prime $p")
    }
  }

  test("PolyHash == HOF polyHash on generated ASCII strings") {
    import spark.implicits._
    val gen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val samples = (1 to 200).flatMap(_ => gen.sample).filter(_.nonEmpty)
    val df = samples.toDF("s")
    val diff = df.select(
      polyHashFast(col("s"), P31).as("fast"),
      polyHash(col("s"), P31).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0)
  }

  test("PolyHash participates in whole-stage codegen") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val plan = docs.select(polyHashFast(col("text"), P31).as("h"))
      .queryExecution.executedPlan
    // the '*(n)' span containing the Project proves codegen, not fallback
    val spans = plan.collect { case w: WholeStageCodegenExec => w }
    assert(spans.nonEmpty, plan.toString)
  }
}
