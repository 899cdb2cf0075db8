package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** DSv2 custom metrics for the graft scans — the user-visible analog of
  * the reference's `EXPLAIN ANALYZE` rows-removed proof
  * (`input/block_filtering.source:11-27`): how much the storage layer
  * skipped lands in the Spark UI / `executedPlan.metrics` of every
  * query, not only in spec-internal counters.
  *
  *  - `graftFilesPrunedStatic`: files dropped by the zone-map pruner
  *    from pushed-down predicates, before the scan was planned;
  *  - `graftFilesPrunedRuntime`: files dropped at runtime by
  *    join-driven filters (SupportsRuntimeV2Filtering), after the
  *    broadcast side materialized;
  *  - `graftDvRowsFiltered`: merge-on-read rows suppressed by deletion
  *    vectors during the read.
  */
private[graft] object GraftMetrics {

  val FilesPrunedStatic = "graftFilesPrunedStatic"
  val FilesPrunedRuntime = "graftFilesPrunedRuntime"
  val DvRowsFiltered = "graftDvRowsFiltered"

  private final class Sum(n: String, d: String) extends CustomSumMetric {
    override def name(): String = n
    override def description(): String = d
  }

  /** The declared metric set — one instance per scan (Spark keys the
    * UI/plan metrics by `name`). */
  def supported: Array[CustomMetric] = Array(
    new Sum(FilesPrunedStatic, "graft files pruned (static zone maps)"),
    new Sum(FilesPrunedRuntime, "graft files pruned (runtime filters)"),
    new Sum(DvRowsFiltered, "graft rows filtered (deletion vectors)"))

  def task(metricName: String, metricValue: Long): CustomTaskMetric =
    new CustomTaskMetric {
      override def name(): String = metricName
      override def value(): Long = metricValue
    }
}
