package org.apache.spark.sql.graft

import java.util.OptionalLong

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.read.{ScanBuilder, Statistics}
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Scan delegation for the graft DSv2 connector: build Spark's own
  * ParquetTable over the graft table's committed file list, so the graft
  * source inherits the full vectorized read stack — column pruning,
  * filter pushdown, row-group skipping, partition parallelism — instead
  * of reimplementing a PartitionReader. Lives in the sql subpackage
  * because the file-source v2 internals are `private[sql]`.
  *
  * Two graft-metadata hooks ride on top of the delegate:
  *
  *  - exact committed row count → Catalyst via `SupportsReportStatistics`
  *    (the reference's always-exact planner estimate,
  *    `cstore_fdw.c:1783-1807`), so a small graft table broadcasts;
  *  - FILE-level zone-map pruning: once filters are pushed, the graft
  *    table's per-file min/max skip list drops refuted files BEFORE the
  *    scan is planned (`cstore_reader.c:744-806` at file grain) — at
  *    cluster scale this prunes tasks, not just row groups.
  */
object ParquetDelegate {

  def scanBuilder(name: String, files: Seq[String], schema: StructType,
      options: CaseInsensitiveStringMap,
      exactRowCount: Option[Long] = None,
      filePruner: Option[Seq[Filter] => Seq[String]] = None): ScanBuilder = {
    val spark = SparkSession.active
    val table = ParquetTable(name, spark, options, files, Some(schema),
      classOf[ParquetFileFormat])
    (exactRowCount, filePruner) match {
      case (None, None) => table.newScanBuilder(options)
      case _ =>
        new GraftScanBuilder(name, spark, table.fileIndex, schema, options,
          files, exactRowCount, filePruner)
    }
  }

  /** ParquetScanBuilder that (a) prunes the file list through the graft
    * zone maps once filters are pushed, and (b) reports the exact row
    * count on the built scan for unfiltered reads. */
  private final class GraftScanBuilder(
      name: String,
      spark: SparkSession,
      fileIndex: PartitioningAwareFileIndex,
      schema: StructType,
      options: CaseInsensitiveStringMap,
      allFiles: Seq[String],
      exactRows: Option[Long],
      filePruner: Option[Seq[Filter] => Seq[String]])
      extends ParquetScanBuilder(spark, fileIndex, schema, schema, options) {

    // Every translated data filter, not just the ones parquet agrees to
    // push: parquet rejects e.g. timestamp filters whenever the session's
    // outputTimestampType is INT96, but the graft file-level pruner is
    // conservative (unknown shapes never refute) and its stat domains are
    // type-checked, so it can consume them all.
    private var translatedDataFilters: Array[Filter] = Array.empty

    override def pushDataFilters(dataFilters: Array[Filter]): Array[Filter] = {
      translatedDataFilters = dataFilters
      super.pushDataFilters(dataFilters)
    }

    override def build(): ParquetScan = {
      val prunedBase = filePruner match {
        case Some(pruner) if translatedDataFilters.nonEmpty =>
          val kept = pruner(translatedDataFilters.toSeq)
          if (kept.size < allFiles.size) {
            // rebuild the delegate over the surviving files, replaying
            // the pushdown state through the public builder API
            val prunedTable = ParquetTable(name, spark, options, kept,
              Some(schema), classOf[ParquetFileFormat])
            val inner = new ParquetScanBuilder(
              spark, prunedTable.fileIndex, schema, schema, options)
            inner.pushFilters(this.dataFilters ++ this.partitionFilters)
            inner.pruneColumns(this.requiredSchema)
            inner.build()
          } else super.build()
        case _ => super.build()
      }
      exactRows match {
        case Some(n) => new StatsParquetScan(prunedBase, n)
        case None => prunedBase
      }
    }
  }

  /** A ParquetScan reporting the table's exact committed row count (plus
    * a schema-derived in-memory size) instead of the on-disk-bytes guess
    * — but only for a bare scan: once filters or aggregates were pushed,
    * the delegate's own estimate is the honest one. */
  private final class StatsParquetScan(base: ParquetScan, exactRows: Long)
      extends ParquetScan(base.sparkSession, base.hadoopConf, base.fileIndex,
        base.dataSchema, base.readDataSchema, base.readPartitionSchema,
        base.pushedFilters, base.options, base.pushedAggregate,
        base.partitionFilters, base.dataFilters) {

    override def estimateStatistics(): Statistics =
      if (pushedFilters.nonEmpty || partitionFilters.nonEmpty ||
          dataFilters.nonEmpty || pushedAggregate.nonEmpty) {
        super.estimateStatistics()
      } else {
        // EstimationUtils-style size: per-row object overhead + field widths
        val rowWidth = 8L + readDataSchema.defaultSize
        new Statistics {
          override def sizeInBytes(): OptionalLong =
            OptionalLong.of(math.max(1L, exactRows * rowWidth))
          override def numRows(): OptionalLong = OptionalLong.of(exactRows)
        }
      }
  }
}
