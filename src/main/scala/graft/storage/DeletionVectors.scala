package graft.storage

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Deletion vectors — merge-on-read DELETE for graft tables.
  *
  * The reference is append-only and lists row-level DELETE as open work
  * (`TODO.md:25-28`); the copy-on-write path (`GraftTable.delete`)
  * rewrites every file the predicate touches, which at 100 TB makes a
  * SPARSE delete (a compliance erasure of 1000 user rows scattered
  * across thousands of immutable files) cost a full rewrite of every
  * touched file. A deletion vector inverts the cost model: the delete
  * records only the POSITIONS of the deleted rows in a tiny sidecar per
  * data file, the data files stay byte-identical, and every read path
  * filters the dead positions out — the Delta/Iceberg merge-on-read
  * shape. Cost of the delete ∝ rows deleted; cost carried by reads is a
  * per-row position lookup on ONLY the files that carry a vector, until
  * a rewrite (compaction, COW update, recluster) materializes and drops
  * it.
  *
  * Sidecar format (one file per data file per delete commit, immutable;
  * a later delete on the same data file writes the UNION as a fresh
  * sidecar and the commit swaps the reference): magic "GDV1", big-endian
  * row count, then ascending big-endian int64 row positions. Positions
  * are parquet row indexes within the data file — the same indexes
  * Spark's `_metadata.row_index` serves, stable under splits,
  * row-group skipping, and predicate pushdown.
  */
object DeletionVectors {

  private val Magic = Array[Byte]('G', 'D', 'V', '1')

  /** Write a sidecar of ascending positions. */
  def write(fs: FileSystem, path: String, positions: Array[Long]): Unit = {
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(new HPath(path), false)))
    try {
      out.write(Magic)
      out.writeLong(positions.length.toLong)
      var i = 0
      while (i < positions.length) {
        require(i == 0 || positions(i) > positions(i - 1),
          s"deletion vector positions must be strictly ascending at $i")
        out.writeLong(positions(i)); i += 1
      }
    } finally out.close()
  }

  /** Read a sidecar back into its ascending position array. */
  def read(fs: FileSystem, path: String): Array[Long] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(new HPath(path))))
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic),
        s"$path is not a graft deletion vector")
      val n = in.readLong()
      require(n >= 0 && n < Int.MaxValue, s"bad deletion vector count $n in $path")
      val out = new Array[Long](n.toInt)
      var i = 0
      while (i < n) { out(i) = in.readLong(); i += 1 }
      out
    } finally in.close()
  }

  /** Merge two ascending position arrays (disjoint by construction —
    * reads apply existing vectors before matching, so a row can be
    * deleted once — but a duplicate would only waste a slot, so the
    * merge dedups defensively). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length || j < b.length) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (k == 0 || out(k - 1) != v) { out(k) = v; k += 1 }
      else () // duplicate
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  /** True when `ri` is a deleted position. */
  def contains(positions: Array[Long], ri: Long): Boolean =
    java.util.Arrays.binarySearch(positions, ri) >= 0

  /** Executor-wide sidecar cache: a vector is immutable once written
    * (updates swap in a NEW sidecar path), so a loaded array stays valid
    * and is shared across all tasks in the JVM. BOUNDED: every mutation
    * commit supersedes sidecars under fresh paths, so a long-lived
    * executor serving a continuously-mutated table would otherwise
    * accumulate every vector ever written until it OOMed — an
    * access-ordered LRU capped at [[MaxEntries]] keeps exactly the hot
    * working set (the vectors of the CURRENT metadata), and an evicted
    * entry merely costs one re-read. */
  object Cache {
    private val MaxEntries = 512
    private val loaded =
      new java.util.LinkedHashMap[String, Array[Long]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[Long]]): Boolean =
          size() > MaxEntries
      }
    def get(path: String, conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
      loaded.synchronized {
        val hit = loaded.get(path)
        if (hit != null) return hit
      }
      // load OUTSIDE the lock (filesystem reads must not serialize the
      // cache); a racing double-load is benign — identical immutable data
      val arr = DeletionVectors.read(new HPath(path).getFileSystem(conf), path)
      loaded.synchronized { loaded.put(path, arr) }
      arr
    }
  }

  /** URI-path normalization shared by every site that keys a map by data
    * file: `_metadata.file_path` renders "file:/x/y", committed lists
    * render "/x/y" or "scheme://host/x/y" — `Path.toUri.getPath` strips
    * scheme + authority from all of them. */
  def normalize(path: String): String = new HPath(path).toUri.getPath

  /** Filter a raw parquet DataFrame (no projection applied yet — the
    * `_metadata` struct must still resolve) down to live rows.
    * `dvByPath`: normalized data-file path → sidecar ABSOLUTE path. */
  def applyDvs(df: DataFrame, dvByPath: Map[String, String],
      conf: SerializableConfiguration): DataFrame =
    if (dvByPath.isEmpty) df
    else {
      import org.apache.spark.sql.graft.Bridge
      df.filter(Bridge.column(DvKeep(
        Bridge.expression(col("_metadata.file_path")),
        Bridge.expression(col("_metadata.row_index")),
        dvByPath, conf)))
    }
}

/** Row-survival predicate: TRUE unless (file, row index) is recorded in
  * that file's deletion vector. A codegen'd Catalyst expression (not a
  * UDF): the generated code makes one virtual call into [[keep]], which
  * memoizes the per-file sidecar resolution so the steady-state row cost
  * is one hash probe + one binary search — only on scans of tables that
  * actually carry vectors.
  *
  * Thread-safety: one expression instance is shared by every task of the
  * plan in an executor JVM (codegen references are per-plan), so the
  * memo is a ConcurrentHashMap and the sidecar arrays are immutable. */
final case class DvKeep(
    filePath: Expression,
    rowIndex: Expression,
    dvByPath: Map[String, String],
    conf: SerializableConfiguration)
    extends BinaryExpression with Predicate {

  override def left: Expression = filePath
  override def right: Expression = rowIndex
  override def nullable: Boolean = false
  override def prettyName: String = "graft_dv_keep"

  // memo: exact file-path string (as the scan renders it) → positions,
  // or NoDv for files without a vector
  private val NoDv = new Array[Long](0)
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  def keep(fp: UTF8String, ri: Long): Boolean = {
    val positions = memo.computeIfAbsent(fp.toString, { s =>
      dvByPath.get(DeletionVectors.normalize(s)) match {
        case Some(dv) => DeletionVectors.Cache.get(dv, conf.value)
        case None => NoDv
      }
    })
    (positions.length == 0) || !DeletionVectors.contains(positions, ri)
  }

  override def nullSafeEval(fp: Any, ri: Any): Any =
    keep(fp.asInstanceOf[UTF8String], ri.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvKeep", this, classOf[DvKeep].getName)
    nullSafeCodeGen(ctx, ev, (fp, ri) => s"${ev.value} = $ref.keep($fp, $ri);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(filePath = newLeft, rowIndex = newRight)
}
