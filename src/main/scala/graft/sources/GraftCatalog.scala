package graft.sources

import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableCatalogCapability, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.storage.{GraftTable, GraftTableOptions}

/** DSv2 `TableCatalog` giving graft tables full SQL lifecycle parity with
  * the reference FDW, which intercepts utility commands so that
  * DROP/TRUNCATE/ALTER manage the underlying columnar files
  * (`/root/reference/cstore_fdw.c:334-412`, the `cstore_drop_trigger`
  * event trigger in `cstore_fdw--1.7.sql:39-59`):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/warehouse")
  *   CREATE TABLE graft.db.t (a INT, b STRING) USING graft
  *   DROP TABLE graft.db.t          -- deletes data + metadata files (sql/drop.sql:30-32)
  *   TRUNCATE TABLE graft.db.t      -- drops data, keeps definition (sql/truncate.sql)
  *   ALTER TABLE graft.db.t ADD COLUMN c INT DEFAULT 5
  *   ALTER TABLE graft.db.t ALTER COLUMN a TYPE BIGINT  -- coercibility-checked
  * }}}
  *
  * The warehouse is any Hadoop-FS URI (`file:`, `hdfs:`, `s3a:`, …);
  * all directory operations go through the resolved `FileSystem`.
  * Tables live at `<warehouse>/<namespace...>/<table>`; a namespace is a
  * directory. Everything routes through [[GraftTable]], so SQL and Scala
  * API lifecycles are the same code path — files can no longer leak from
  * a SQL `DROP TABLE` the way they did when the source was a bare
  * `TableProvider`.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catName: String = _
  private var warehouse: String = _
  private var fs: FileSystem = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"catalog '$name' requires option 'spark.sql.catalog.$name.warehouse'")
    // Absolutize scheme-less paths so every table dir key is canonical;
    // URI locations (hdfs://, s3a://, ...) pass through untouched.
    warehouse =
      if (new HPath(w).toUri.getScheme == null)
        java.nio.file.Paths.get(w).toAbsolutePath.normalize.toString
      else w.stripSuffix("/")
    val (f, root) = GraftTable.fsAndPath(warehouse)
    fs = f
    fs.mkdirs(root)
    ()
  }

  override def name(): String = catName

  // Lets ALTER/CREATE carry column DEFAULT clauses through to us.
  override def capabilities(): JSet[TableCatalogCapability] =
    Set(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE).asJava

  private def tableDir(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(s"$warehouse/", "/", "")

  private def nsDir(namespace: Array[String]): HPath =
    new HPath(namespace.mkString(s"$warehouse/", "/", "").stripSuffix("/"))

  private def isDir(p: HPath): Boolean =
    fs.exists(p) && fs.getFileStatus(p).isDirectory

  // ---- tables --------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!isDir(d)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(d).toSeq
      .filter(st => GraftTable.exists(st.getPath.toString))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftTable.exists(tableDir(ident))

  override def loadTable(ident: Identifier): Table = {
    val d = tableDir(ident)
    if (!GraftTable.exists(d)) throw new NoSuchTableException(ident)
    new GraftSparkTable(d)
  }

  /** SQL `VERSION AS OF <v>` — read-only snapshot relation. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = tableDir(ident)
    if (!GraftTable.exists(d)) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft snapshot versions are integers, got '$version'")
    }
    new GraftSnapshotTable(d, v)
  }

  /** SQL `TIMESTAMP AS OF <ts>` — Spark hands micros since epoch; the
    * newest snapshot committed at or before it serves the read. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val d = tableDir(ident)
    if (!GraftTable.exists(d)) throw new NoSuchTableException(ident)
    val v = GraftTable.versionAsOfTimestamp(d, timestampMicros / 1000L)
    new GraftSnapshotTable(d, v)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    // the one partition transform graft supports is hash bucketing —
    // `CLUSTERED BY (k) INTO n BUCKETS` arrives here as a bucket
    // transform; identity/other transforms are refused
    val bucketTransform = partitions.toSeq match {
      case Seq() => None
      case Seq(t) if t.name == "bucket" =>
        val cols = t.references().toSeq.map(_.fieldNames().mkString("."))
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }
        require(cols.size == 1 && n.isDefined,
          "graft bucketing takes exactly one column and a bucket count")
        Some((cols.head, n.get))
      case other => throw new UnsupportedOperationException(
        s"graft tables support only bucket partition transforms, got ${other.mkString(", ")}")
    }
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    def prop(key: String): Option[String] =
      Option(properties.get(TableCatalog.OPTION_PREFIX + key))
        .orElse(Option(properties.get(key)))
    val opts = GraftTableOptions(
      compression = prop("compression").getOrElse("zstd"),
      stripeRowCount = prop("stripe_row_count").map(_.toLong).getOrElse(150000L),
      blockRowCount = prop("block_row_count").map(_.toLong).getOrElse(10000L),
      sortBy = prop("sort_by").map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
      zorderBy = prop("zorder_by").map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
      bloomFilterColumns = prop("bloom_filter_columns")
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty),
      bucketBy = bucketTransform.map(_._1)
        .orElse(prop("bucket_by").map(_.trim)).toSeq,
      bucketCount = bucketTransform.map(_._2)
        .orElse(prop("bucket_count").map(_.toInt)).getOrElse(0),
      deleteMode = prop("delete_mode").getOrElse("copy-on-write"),
      autoCompactMinFiles = prop("auto_compact_min_files").map(_.toInt).getOrElse(0),
      // CHECK constraints arrive as `check.<name>` properties (CREATE
      // TABLE ... TBLPROPERTIES('check.pos' = 'v >= 0')); expressions
      // validate against the schema inside GraftTable.create
      checks = {
        import scala.jdk.CollectionConverters._
        properties.asScala.collect {
          case (k, v) if k.startsWith("check.") =>
            k.stripPrefix("check.") -> v
          case (k, v) if k.startsWith(TableCatalog.OPTION_PREFIX + "check.") =>
            k.stripPrefix(TableCatalog.OPTION_PREFIX + "check.") -> v
        }.toMap
      })
    fs.mkdirs(nsDir(ident.namespace()))
    GraftTable.create(SparkSession.active, tableDir(ident), schema, opts)
    new GraftSparkTable(tableDir(ident))
  }

  /** ALTER routed through [[GraftTable]]'s coercibility + constant-default
    * validation — the reference's `CStoreProcessUtility` checks
    * (`cstore_fdw.c:717-769`). A multi-change ALTER is all-or-nothing:
    * every change is validated and applied to an in-memory copy of the
    * metadata first, and a single commit publishes them, so a failing
    * later change can't leave earlier ones durably applied behind a
    * statement Spark reports as failed. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = tableDir(ident)
    if (!GraftTable.exists(d)) throw new NoSuchTableException(ident)
    val t = GraftTable.open(SparkSession.active, d)
    // RENAME COLUMN is not a metadata-only change on a by-name format —
    // it rewrites the table (see GraftTable.renameColumn) — so it cannot
    // ride the alterAll transaction. Spark sends it as a single-change
    // ALTER; refuse a mix rather than half-apply one.
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    if (renames.nonEmpty) {
      require(renames.size == changes.size,
        "RENAME COLUMN rewrites the table and cannot combine with other ALTER changes")
      renames.foreach { r =>
        require(r.fieldNames().length == 1,
          s"nested column ${r.fieldNames().mkString(".")} not supported")
        t.renameColumn(r.fieldNames()(0), r.newName())
      }
      return loadTable(ident)
    }
    t.alterAll(changes.map {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          s"nested column ${add.fieldNames().mkString(".")} not supported")
        val default = Option(add.defaultValue()).map(_.getValue.value() match {
          case u: UTF8String => u.toString
          case other => other
        }).orNull
        GraftTable.AddCol(add.fieldNames()(0), add.dataType(), default)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          s"nested column ${del.fieldNames().mkString(".")} not supported")
        GraftTable.DropCol(del.fieldNames()(0))
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames().length == 1,
          s"nested column ${upd.fieldNames().mkString(".")} not supported")
        GraftTable.AlterColType(upd.fieldNames()(0), upd.newDataType())
      // SET TBLPROPERTIES → the reference's ALTER … OPTIONS (SET …)
      // validator (`cstore_fdw.c:1273-1340`); GraftTable restricts the
      // settable keys to the write-shaping trio and rejects the rest
      case set: TableChange.SetProperty =>
        GraftTable.SetOption(set.property(), set.value())
      case rm: TableChange.RemoveProperty =>
        GraftTable.UnsetOption(rm.property())
      case other =>
        throw new UnsupportedOperationException(s"ALTER change $other is not supported")
    })
    loadTable(ident)
  }

  /** DROP TABLE garbage-collects the data directory — the reference's
    * object-access-hook file unlink (`cstore_fdw.c:776-925`,
    * `sql/drop.sql:30-32` proves the file disappears). */
  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    if (GraftTable.exists(d)) { GraftTable.drop(d); true } else false
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(nsDir(newIdent.namespace()))
    require(fs.rename(new HPath(tableDir(oldIdent)), new HPath(tableDir(newIdent))),
      s"rename ${oldIdent} -> ${newIdent} failed")
    ()
  }

  // ---- maintenance procedures (CALL graft.system.<proc>('db.t')) -----

  /** `CALL <catalog>.system.{compact|vacuum|analyze|table_size}('ns.t')`
    * — the reference's utility-UDF surface plus the VACUUM its TODO
    * leaves open, on Spark 4's DSv2 procedure SPI. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident,
      tableName => s"$warehouse/${tableName.replace('.', '/')}")

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.Names.map(n => Identifier.of(Array("system"), n)).toArray

  // ---- functions -----------------------------------------------------

  /** The catalog's one function: `bucket(n, key)`, the write-path route of
    * bucketed tables. Catalyst loads it to resolve a bucketed scan's
    * reported `KeyGroupedPartitioning` — the storage-partitioned-join
    * handshake ([[graft.functions.GraftBucketFunction]]). */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket" &&
        (ident.namespace().isEmpty || ident.namespace().sameElements(Array("system"))))
      graft.functions.GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array("system"), "bucket"))

  override def functionExists(ident: Identifier): Boolean =
    try { loadFunction(ident); true }
    catch { case _: org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException => false }

  // ---- namespaces (directories under the warehouse) ------------------

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(new HPath(warehouse)).toSeq
      .filter(st => st.isDirectory && !GraftTable.exists(st.getPath.toString))
      .map(st => Array(st.getPath.getName))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = nsDir(namespace)
    if (!isDir(d)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(d).toSeq
      .filter(st => st.isDirectory && !GraftTable.exists(st.getPath.toString))
      .map(st => namespace :+ st.getPath.getName)
      .toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!isDir(nsDir(namespace))) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    fs.mkdirs(nsDir(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!isDir(d)) throw new NoSuchNamespaceException(namespace)
    if (!cascade && fs.listStatus(d).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(d, true)
    true
  }
}
