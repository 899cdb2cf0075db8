package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Scan delegation for the graft DSv2 connector: build Spark's own
  * ParquetTable over the graft table's committed file list, so the graft
  * source inherits the full vectorized read stack — column pruning,
  * filter pushdown, row-group skipping, partition parallelism — instead
  * of reimplementing a PartitionReader. Lives in the sql subpackage
  * because the file-source v2 internals are `private[sql]`. */
object ParquetDelegate {

  def scanBuilder(name: String, files: Seq[String], schema: StructType,
      options: CaseInsensitiveStringMap): ScanBuilder = {
    val spark = SparkSession.active
    ParquetTable(name, spark, options, files, Some(schema),
      classOf[ParquetFileFormat]).newScanBuilder(options)
  }
}
