package org.apache.spark.sql.graft

import java.util.OptionalLong

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.read.{ScanBuilder, Statistics}
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Scan delegation for the graft DSv2 connector: build Spark's own
  * ParquetTable over the graft table's committed file list, so the graft
  * source inherits the full vectorized read stack — column pruning,
  * filter pushdown, row-group skipping, partition parallelism — instead
  * of reimplementing a PartitionReader. Lives in the sql subpackage
  * because the file-source v2 internals are `private[sql]`.
  *
  * When the caller knows the table's exact committed row count (graft
  * metadata maintains one — the reference's always-exact planner estimate,
  * `cstore_fdw.c:1783-1807`), the built scan reports it to Catalyst
  * through `SupportsReportStatistics`, replacing the file-size guess.
  * That is the reference ANALYZE's entire purpose — feeding the planner
  * (`cstore_fdw.c:1628-1720`) — and is what lets a small graft table's
  * join side flip to broadcast.
  */
object ParquetDelegate {

  def scanBuilder(name: String, files: Seq[String], schema: StructType,
      options: CaseInsensitiveStringMap, exactRowCount: Option[Long] = None): ScanBuilder = {
    val spark = SparkSession.active
    val table = ParquetTable(name, spark, options, files, Some(schema),
      classOf[ParquetFileFormat])
    exactRowCount match {
      case Some(n) =>
        new StatsScanBuilder(spark, table.fileIndex, schema, schema, options, n)
      case None => table.newScanBuilder(options)
    }
  }

  /** ParquetScanBuilder whose built scan carries the exact row count. */
  private final class StatsScanBuilder(
      spark: SparkSession,
      fileIndex: PartitioningAwareFileIndex,
      schema: StructType,
      dataSchema: StructType,
      options: CaseInsensitiveStringMap,
      exactRows: Long)
      extends ParquetScanBuilder(spark, fileIndex, schema, dataSchema, options) {

    override def build(): ParquetScan = {
      val base = super.build()
      new StatsParquetScan(base, exactRows)
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
