package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, LessThan}

import graft.storage.GraftTable

/** Driver-oracle-checked entries for the row-level mutation surface
  * (DELETE / UPDATE / MERGE, the reference's open TODO items
  * `TODO.md:25-28` delivered as copy-on-write rewrites on the graft
  * commit protocol). Each entry materializes a scratch graft table from
  * the round's parquet input, applies the mutation through the public
  * API, and returns the table's post-mutation state; the DuckDB oracle
  * recomputes the same final state declaratively over the raw parquet —
  * so the whole pipeline (append, zone-map candidate pruning, rewrite,
  * CAS commit, read-back) is hash-checked, not just spec-checked.
  *
  * Scratch tables live in fresh temp dirs (one per invocation) so the
  * concurrent Verify/Bench pools never collide; they are small (one
  * customer table) and left to the OS tmp reaper because the returned
  * DataFrame reads them lazily.
  */
object MutationQueries {

  private def scratch(s: SparkSession, dir: String): GraftTable = {
    val df = s.read.parquet(s"$dir/customer.parquet")
    val loc = Files.createTempDirectory("graft_mut").toString + "/t"
    val t = GraftTable.create(s, loc, df.schema)
    t.append(df)
    t
  }

  /** n1: DELETE WHERE c_mktsegment = 'BUILDING' — rows in non-matching
    * files are carried untouched (zone-map candidate pruning), matching
    * rows are dropped via the copy-on-write rewrite. */
  def n1Delete(s: SparkSession, dir: String): DataFrame = {
    val t = scratch(s, dir)
    t.delete(Seq(EqualTo("c_mktsegment", "BUILDING")))
    t.read().orderBy("c_custkey")
  }

  /** n2: UPDATE SET c_acctbal = c_acctbal + 1000 WHERE c_acctbal < 0 —
    * assignments may read the row's own columns. */
  def n2Update(s: SparkSession, dir: String): DataFrame = {
    val t = scratch(s, dir)
    t.update(Map("c_acctbal" -> (col("c_acctbal") + lit(1000.0))),
      Seq(LessThan("c_acctbal", 0.0)))
    t.read().orderBy("c_custkey")
  }

  /** n3: MERGE (upsert) of a CDC-shaped increment: every fifth customer
    * arrives re-stated with a credited balance (updates), every
    * (7k+3)-keyed customer re-arrives under a shifted key (inserts). */
  def n3Merge(s: SparkSession, dir: String): DataFrame = {
    val t = scratch(s, dir)
    val base = s.read.parquet(s"$dir/customer.parquet")
    val updates = base.filter(col("c_custkey") % 5 === 0)
      .withColumn("c_acctbal", col("c_acctbal") + lit(5000.0))
    val inserts = base.filter(col("c_custkey") % 7 === 3)
      .withColumn("c_custkey", col("c_custkey") + lit(1000000L))
    t.merge(updates.unionByName(inserts), Seq("c_custkey"))
    t.read().orderBy("c_custkey")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "n1_delete" -> n1Delete _,
    "n2_update" -> n2Update _,
    "n3_merge" -> n3Merge _)

  val oracles: Map[String, String] = Map(
    // delete keeps NULL-predicate rows (kept = NOT coalesce(cond,false)),
    // i.e. IS DISTINCT FROM semantics
    "n1_delete" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_mktsegment IS DISTINCT FROM 'BUILDING'
        |ORDER BY c_custkey""".stripMargin,
    "n2_update" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_acctbal < 0 THEN c_acctbal + 1000 ELSE c_acctbal END
        |    AS c_acctbal,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "n3_merge" ->
      """SELECT * FROM (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 5 <> 0
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 5000, c_mktsegment
        |  FROM customer WHERE c_custkey % 5 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 7 = 3
        |) ORDER BY c_custkey""".stripMargin)
}
