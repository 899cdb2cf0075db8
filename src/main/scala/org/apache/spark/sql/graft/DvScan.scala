package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.storage.DeletionVectors

/** Deletion-vector + row-lineage support for the DSv2 scans (the
  * delegate's StatsParquetScan and the row-level CowParquetScan).
  *
  * Mechanism: the scan's parquet read schema gets Spark's row-index
  * TEMPORARY column appended (`ParquetFileFormat.
  * ROW_INDEX_TEMPORARY_COLUMN_NAME` — the same machinery
  * `_metadata.row_index` rides on), so every reader emits each row's
  * file-global position, correct under splits, row-group skipping, and
  * predicate pushdown. The wrapped reader factory then reads each
  * partition file-by-file and can
  *
  *  - drop rows whose position is recorded in that file's deletion
  *    vector (merge-on-read deletes), and
  *  - serve the graft ROW-LINEAGE metadata columns `_graft_file` /
  *    `_graft_pos` (the row's physical address — the rowId the
  *    delta-based SQL DML path keys its position deletes on),
  *
  * then project the temporary column away; the scan's DECLARED
  * `readSchema()` is data columns plus exactly the REQUESTED metadata
  * columns, so the plan above sees nothing else.
  *
  * A scan of a vector-free table with no metadata request keeps its
  * original factory — vectorized/columnar path untouched. Wrapped scans
  * serve rows (not columnar batches): the per-batch position filter
  * would need batch rebuilding, and the cost lands on exactly the scans
  * that need row addresses or carry dead rows. */
object DvScan {

  val RowIndexCol: String = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** Row-lineage metadata columns: the row's physical address. */
  val FileCol = "_graft_file"
  val PosCol = "_graft_pos"
  val MetaNames: Set[String] = Set(FileCol, PosCol)

  def withRowIndex(schema: StructType): StructType =
    schema.add(StructField(RowIndexCol, LongType, nullable = true))

  def strip(schema: StructType): StructType =
    StructType(schema.fields.filterNot(_.name == RowIndexCol))

  /** Wraps a parquet reader factory whose rows carry the row-index
    * column LAST; filters dead positions, appends requested lineage
    * columns, projects the row-index column away. */
  final class DvReaderFactory(
      inner: PartitionReaderFactory,
      dvByPath: Map[String, String], // normalized data path → sidecar abs path
      conf: SerializableConfiguration,
      dataTypes: Array[DataType],
      metaNames: Seq[String] = Seq.empty)
      extends PartitionReaderFactory {

    override def supportColumnarReads(partition: InputPartition): Boolean = false

    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      partition match {
        case fp: FilePartition =>
          new DvPartitionReader(fp, inner, dvByPath, conf, dataTypes, metaNames)
        case other => throw new IllegalStateException(
          s"graft DV scan planned a non-file partition: ${other.getClass.getName}")
      }
  }

  private final class DvPartitionReader(
      fp: FilePartition,
      inner: PartitionReaderFactory,
      dvByPath: Map[String, String],
      conf: SerializableConfiguration,
      dataTypes: Array[DataType],
      metaNames: Seq[String])
      extends PartitionReader[InternalRow] {

    private val files = fp.files
    private val nData = dataTypes.length
    private val riOrdinal = nData // row index appended after the data columns
    // output = data columns ++ requested lineage columns, projected off a
    // JoinedRow [innerRow(nData+1) | metaRow(file)] — one codegen'd
    // projection for the whole scan, the per-file constant rides in the
    // mutable metaRow
    private val proj = UnsafeProjection.create(
      (dataTypes.zipWithIndex.map { case (t, i) =>
        BoundReference(i, t, nullable = true)
      } ++ metaNames.map {
        case FileCol => BoundReference(nData + 1, StringType, nullable = false)
        case PosCol => BoundReference(riOrdinal, LongType, nullable = false)
        case other => throw new IllegalStateException(s"unknown lineage column $other")
      }).toIndexedSeq)
    private val metaRow = new GenericInternalRow(1)
    private val joined = new JoinedRow
    private var idx = -1
    private var cur: PartitionReader[InternalRow] = _
    private var dv: Array[Long] = _
    private var row: InternalRow = _
    private var dvFiltered = 0L

    override def next(): Boolean = {
      while (true) {
        if (cur == null) {
          idx += 1
          if (idx >= files.length) return false
          val pf = files(idx)
          cur = inner.createReader(FilePartition(0, Array(pf)))
          dv = dvByPath.get(pf.filePath.toPath.toUri.getPath)
            .map(p => DeletionVectors.Cache.get(p, conf.value)).orNull
          metaRow.update(0, UTF8String.fromString(pf.filePath.toString))
        }
        if (!cur.next()) { cur.close(); cur = null }
        else {
          val r = cur.get()
          if (dv == null || !DeletionVectors.contains(dv, r.getLong(riOrdinal))) {
            row = proj(joined(r, metaRow))
            return true
          } else dvFiltered += 1
        }
      }
      false // unreachable
    }

    override def get(): InternalRow = row
    override def close(): Unit = if (cur != null) cur.close()

    override def currentMetricsValues()
        : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
      Array(GraftMetrics.task(GraftMetrics.DvRowsFiltered, dvFiltered))
  }
}
