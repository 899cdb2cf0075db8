package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.storage.DeletionVectors

/** Deletion-vector support for the DSv2 scans (the delegate's
  * StatsParquetScan and the row-level CowParquetScan).
  *
  * Mechanism: the scan's parquet read schema gets Spark's row-index
  * TEMPORARY column appended (`ParquetFileFormat.
  * ROW_INDEX_TEMPORARY_COLUMN_NAME` — the same machinery
  * `_metadata.row_index` rides on), so every reader emits each row's
  * file-global position, correct under splits, row-group skipping, and
  * predicate pushdown. The wrapped reader factory then reads each
  * partition file-by-file, drops rows whose position is recorded in
  * that file's vector, and projects the temporary column away; the
  * scan's DECLARED `readSchema()` never contains it, so the plan above
  * is unchanged.
  *
  * A scan of a table with NO vectors keeps its original factory —
  * vectorized/columnar path untouched. With vectors present the scan
  * serves rows (not columnar batches): the per-batch position filter
  * would need batch rebuilding, and vectored files are the
  * recently-mutated minority that the next compaction/rewrite
  * materializes anyway — the standing cost lands on exactly the files
  * that carry dead rows, and disappears with them. */
object DvScan {

  val RowIndexCol: String = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  def withRowIndex(schema: StructType): StructType =
    schema.add(StructField(RowIndexCol, LongType, nullable = true))

  def strip(schema: StructType): StructType =
    StructType(schema.fields.filterNot(_.name == RowIndexCol))

  /** Wraps a parquet reader factory whose rows carry the row-index
    * column LAST; filters dead positions, projects the column away. */
  final class DvReaderFactory(
      inner: PartitionReaderFactory,
      dvByPath: Map[String, String], // normalized data path → sidecar abs path
      conf: SerializableConfiguration,
      outTypes: Array[DataType])
      extends PartitionReaderFactory {

    override def supportColumnarReads(partition: InputPartition): Boolean = false

    override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
      partition match {
        case fp: FilePartition => new DvPartitionReader(fp, inner, dvByPath, conf, outTypes)
        case other => throw new IllegalStateException(
          s"graft DV scan planned a non-file partition: ${other.getClass.getName}")
      }
  }

  private final class DvPartitionReader(
      fp: FilePartition,
      inner: PartitionReaderFactory,
      dvByPath: Map[String, String],
      conf: SerializableConfiguration,
      outTypes: Array[DataType])
      extends PartitionReader[InternalRow] {

    private val files = fp.files
    private val riOrdinal = outTypes.length // row index appended last
    private val proj = UnsafeProjection.create(outTypes.zipWithIndex.map {
      case (t, i) => BoundReference(i, t, nullable = true)
    }.toIndexedSeq)
    private var idx = -1
    private var cur: PartitionReader[InternalRow] = _
    private var dv: Array[Long] = _
    private var row: InternalRow = _

    override def next(): Boolean = {
      while (true) {
        if (cur == null) {
          idx += 1
          if (idx >= files.length) return false
          val pf = files(idx)
          cur = inner.createReader(FilePartition(0, Array(pf)))
          dv = dvByPath.get(pf.filePath.toPath.toUri.getPath)
            .map(p => DeletionVectors.Cache.get(p, conf.value)).orNull
        }
        if (!cur.next()) { cur.close(); cur = null }
        else {
          val r = cur.get()
          if (dv == null || !DeletionVectors.contains(dv, r.getLong(riOrdinal))) {
            row = proj(r)
            return true
          }
        }
      }
      false // unreachable
    }

    override def get(): InternalRow = row
    override def close(): Unit = if (cur != null) cur.close()
  }
}
