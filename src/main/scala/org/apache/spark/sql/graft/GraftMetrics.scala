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

  // one zero-arg class per metric: Spark's status store re-instantiates
  // metric classes REFLECTIVELY when aggregating for the UI, so a shared
  // parameterized class fails with "did not have a zero-argument
  // constructor"
  final class FilesPrunedStaticMetric extends CustomSumMetric {
    override def name(): String = FilesPrunedStatic
    override def description(): String = "graft files pruned (static zone maps)"
  }
  final class FilesPrunedRuntimeMetric extends CustomSumMetric {
    override def name(): String = FilesPrunedRuntime
    override def description(): String = "graft files pruned (runtime filters)"
  }
  final class DvRowsFilteredMetric extends CustomSumMetric {
    override def name(): String = DvRowsFiltered
    override def description(): String = "graft rows filtered (deletion vectors)"
  }

  /** The declared metric set — one instance per scan (Spark keys the
    * UI/plan metrics by `name`). */
  def supported: Array[CustomMetric] = Array(
    new FilesPrunedStaticMetric, new FilesPrunedRuntimeMetric,
    new DvRowsFilteredMetric)

  def task(metricName: String, metricValue: Long): CustomTaskMetric =
    new CustomTaskMetric {
      override def name(): String = metricName
      override def value(): Long = metricValue
    }
}
