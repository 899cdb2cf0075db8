package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

import graft.storage.{GraftTable, GraftTableOptions}

/** Incrementally-maintained aggregate over a graft table — the CONSUMER
  * side of the change data feed, and the reason it exists: a per-key
  * COUNT + SUM rollup of a 100 TB fact table is kept current by folding
  * each commit's row diff (insert = +1/+v, delete = −1/−v; an update is
  * its delete+insert pair, so it folds to the value delta), instead of
  * re-aggregating the table. Per-trigger cost is proportional to the
  * data each commit TOUCHED — the incremental-view-maintenance shape —
  * while a recompute is proportional to the table.
  *
  * Mechanics: a `graft-cdf` stream from version 0 feeds a
  * `foreachBatch` that (1) folds the batch's diff rows into per-key
  * deltas, (2) reads the CURRENT maintained values for just those keys
  * (zone-map pruned — the target is key-clustered), (3) merges the new
  * absolute rows via [[GraftTable.mergeStream]]. Exactly-once rides the
  * merge's txn watermark: the batch id is recorded in the SAME atomic
  * commit as the merge, so a checkpoint-replayed batch — even one that
  * recomputes its absolute rows from already-folded state — is
  * discarded at commit, not re-applied.
  *
  * A key whose rows are all deleted keeps a `cnt = 0` tombstone row
  * (MERGE upserts, it does not delete); [[read]] filters tombstones, so
  * consumers see exactly the groupBy a batch recompute would produce.
  */
object GraftAggMaintain {

  def txnId(checkpoint: String): String =
    s"aggmaintain:${checkpoint.stripSuffix("/")}"

  /** Maintained-table schema: the key columns as in the source, plus
    * the running `sum` (double) and `cnt` (long). */
  private def targetSchema(source: StructType, keyCols: Seq[String]): StructType =
    StructType(keyCols.map(k => source(k).copy(nullable = true)) :+
      org.apache.spark.sql.types.StructField("sum", DoubleType) :+
      org.apache.spark.sql.types.StructField("cnt", LongType))

  /** Start maintaining `sum(valueCol), count(*) GROUP BY keyCols` of the
    * graft table at `source` into a graft table at `target` (created
    * key-clustered if absent). */
  def start(spark: SparkSession, source: String, target: String,
      keyCols: Seq[String], valueCol: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(keyCols.nonEmpty, "aggregate maintenance requires key columns")
    val srcSchema = GraftTable.open(spark, source).readSchema()
    val tgt =
      if (GraftTable.exists(target)) GraftTable.open(spark, target)
      else GraftTable.create(spark, target, targetSchema(srcSchema, keyCols),
        GraftTableOptions(sortBy = Seq(keyCols.head)))
    val id = txnId(checkpoint)
    spark.readStream.format("graft-cdf")
      .option("path", source)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
        val delta = batch
          .withColumn("__s", sign)
          .groupBy(keyCols.map(col): _*)
          .agg(sum(col(valueCol).cast(DoubleType) * col("__s")).as("__dsum"),
            sum(col("__s")).as("__dcnt"))
        if (!delta.isEmpty) {
          // current values for ONLY the touched keys (key-clustered
          // target: the join prunes to the touched files' key range)
          val current = tgt.read().select(
            (keyCols.map(col) ++ Seq(col("sum"), col("cnt"))): _*)
          val merged = delta.join(current, keyCols, "left")
            .select((keyCols.map(col) ++ Seq(
              (coalesce(col("sum"), lit(0.0)) + col("__dsum")).as("sum"),
              (coalesce(col("cnt"), lit(0L)) + col("__dcnt")).as("cnt"))): _*)
          tgt.mergeStream(merged, keyCols, id, batchId)
        }
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** The maintained aggregate as consumers should see it — tombstoned
    * keys (every source row deleted) excluded. */
  def read(spark: SparkSession, target: String): DataFrame =
    GraftTable.open(spark, target).read().filter(col("cnt") > 0)
}
