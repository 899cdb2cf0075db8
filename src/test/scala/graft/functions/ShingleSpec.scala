package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.Shingles.{shinglesDistinctFast, shinglesFast}
import graft.functions.TextFunctions._

/** The native Shingles expression must agree exactly with the HOF
  * shinglesAll (which the DuckDB oracle replicates) — including the
  * split-keeps-trailing-empties edge cases. */
class ShingleSpec extends SparkSpec {

  test("shinglesFast == shinglesAll on the documents corpus") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val diff = docs.select(
      shinglesFast(col("text")).as("fast"),
      shinglesAll(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0)
  }

  test("shinglesDistinctFast == array_distinct(shinglesAll) on the corpus") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val diff = docs.select(
      shinglesDistinctFast(col("text")).as("fast"),
      shingles(col("text")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(diff === 0)
  }

  test("shinglesFast == shinglesAll on edge-case strings") {
    import spark.implicits._
    val edge = Seq("", " ", "  ", "a", "a b", "a b c", "a b c d",
      "a  b c", " a b c ", "x y z w v").toDF("text")
    val rows = edge.select(
      shinglesFast(col("text")).as("fast"),
      shinglesAll(col("text")).as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1), r.toString)
    }
  }
}
