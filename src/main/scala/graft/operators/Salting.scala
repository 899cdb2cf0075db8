package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale (AQE's skew-join handles
  * sort-merge joins adaptively; these cover the two shapes it doesn't:
  * skewed aggregation state and broadcast-side replication).
  *
  * - [[saltedAggregate]]: two-phase aggregation — partial state is split
  *   across `saltBuckets` shuffle keys so one hot group key cannot pin a
  *   single reducer; the final phase merges the per-salt partials.
  * - [[saltedJoin]]: equi-join where the build side is replicated once
  *   per salt bucket and the probe side is deterministically salted by a
  *   hash of its row, spreading a hot join key over `saltBuckets`
  *   partitions.
  *
  * Both are pure plan rewrites (deterministic salts, no UDFs) and
  * produce results identical to their unsalted forms. */
object Salting {

  /** Deterministic per-row salt in [0, buckets). */
  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(buckets))

  /** Two-phase salted sum/count aggregation over `groupCols`.
    * `aggs` maps result column name -> (partial expr, merge expr) where
    * the merge expr operates on the partial's column name. */
  def saltedAggregate(df: DataFrame, groupCols: Seq[String], buckets: Int,
      aggs: Map[String, (Column, String => Column)]): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, buckets))
    val partialAggs = aggs.map { case (name, (partial, _)) => partial.as(s"__p_$name") }
    val partial = salted.groupBy((groupCols :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail.toSeq: _*)
    val finalAggs = aggs.map { case (name, (_, merge)) => merge(s"__p_$name").as(name) }
    partial.groupBy(groupCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail.toSeq: _*)
  }

  /** Exact `count(DISTINCT distinctCol)` per group, salt-partitioned:
    * each distinct value lands in exactly one salt bucket (salt = hash
    * of the VALUE, not the row), so per-bucket distinct counts are
    * disjoint and the merge is a plain sum. This is the aggregation
    * shape partial aggregation cannot fix — a hot group's entire
    * distinct state otherwise lands on one reducer — and it is exact,
    * unlike approx_count_distinct. Used by
    * [[Events.e3DistinctUsers]] (oracle-checked against DuckDB's
    * count(DISTINCT)). */
  def saltedDistinctCount(df: DataFrame, groupCols: Seq[String],
      distinctCol: String, resultName: String, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(col(distinctCol)), lit(buckets)))
    val partial = salted
      .groupBy((groupCols :+ "__salt").map(col): _*)
      .agg(count_distinct(col(distinctCol)).as("__pd"), count(lit(1)).as("__pc"))
    partial.groupBy(groupCols.map(col): _*)
      .agg(sum("__pd").as(resultName), sum("__pc").as("cnt"))
  }

  /** Salted inner equi-join: `probe` (large, skewed) joins `build`
    * (small enough to replicate `buckets` times). */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, buckets: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt", rowSalt(probe, buckets))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedProbe.join(replicatedBuild,
      saltedProbe(probeKey) === replicatedBuild(buildKey) &&
        saltedProbe("__salt") === replicatedBuild("__salt"))
      .drop("__salt")
  }
}
