package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap, Set => JSet}

import scala.jdk.CollectionConverters._

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
  * Tables live at `<warehouse>/<namespace...>/<table>`; a namespace is a
  * directory. Everything routes through [[GraftTable]], so SQL and Scala
  * API lifecycles are the same code path — files can no longer leak from
  * a SQL `DROP TABLE` the way they did when the source was a bare
  * `TableProvider`.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"catalog '$name' requires option 'spark.sql.catalog.$name.warehouse'")
    warehouse = Paths.get(GraftTable.stripUri(w)).toAbsolutePath.normalize
    Files.createDirectories(warehouse)
    ()
  }

  override def name(): String = catName

  // Lets ALTER/CREATE carry column DEFAULT clauses through to us.
  override def capabilities(): JSet[TableCatalogCapability] =
    Set(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE).asJava

  private def tableDir(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).foldLeft(warehouse)(_.resolve(_)).toString

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)(_.resolve(_))

  // ---- tables --------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    Files.list(d).iterator().asScala
      .filter(p => GraftTable.exists(p.toString))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftTable.exists(tableDir(ident))

  override def loadTable(ident: Identifier): Table = {
    val d = tableDir(ident)
    if (!GraftTable.exists(d)) throw new NoSuchTableException(ident)
    new GraftSparkTable(d)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    require(partitions.isEmpty, "graft tables do not support partition transforms")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    def prop(key: String): Option[String] =
      Option(properties.get(TableCatalog.OPTION_PREFIX + key))
        .orElse(Option(properties.get(key)))
    val opts = GraftTableOptions(
      compression = prop("compression").getOrElse("zstd"),
      stripeRowCount = prop("stripe_row_count").map(_.toLong).getOrElse(150000L),
      blockRowCount = prop("block_row_count").map(_.toLong).getOrElse(10000L),
      sortBy = prop("sort_by").map(_.split(",").map(_.trim).toSeq).getOrElse(Seq.empty))
    Files.createDirectories(nsDir(ident.namespace()))
    GraftTable.create(SparkSession.active, tableDir(ident), schema, opts)
    new GraftSparkTable(tableDir(ident))
  }

  /** ALTER routed through [[GraftTable]]'s coercibility + constant-default
    * validation — the reference's `CStoreProcessUtility` checks
    * (`cstore_fdw.c:717-769`). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = tableDir(ident)
    if (!GraftTable.exists(d)) throw new NoSuchTableException(ident)
    val t = GraftTable.open(SparkSession.active, d)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          s"nested column ${add.fieldNames().mkString(".")} not supported")
        val default = Option(add.defaultValue()).map(_.getValue.value() match {
          case u: UTF8String => u.toString
          case other => other
        }).orNull
        t.addColumn(add.fieldNames()(0), add.dataType(), default)
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          s"nested column ${del.fieldNames().mkString(".")} not supported")
        t.dropColumn(del.fieldNames()(0))
      case upd: TableChange.UpdateColumnType =>
        require(upd.fieldNames().length == 1,
          s"nested column ${upd.fieldNames().mkString(".")} not supported")
        t.alterColumnType(upd.fieldNames()(0), upd.newDataType())
      case other =>
        throw new UnsupportedOperationException(s"ALTER change $other is not supported")
    }
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
    Files.createDirectories(nsDir(newIdent.namespace()))
    Files.move(Paths.get(tableDir(oldIdent)), Paths.get(tableDir(newIdent)))
    ()
  }

  // ---- namespaces (directories under the warehouse) ------------------

  override def listNamespaces(): Array[Array[String]] =
    Files.list(warehouse).iterator().asScala
      .filter(p => Files.isDirectory(p) && !GraftTable.exists(p.toString))
      .map(p => Array(p.getFileName.toString))
      .toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    Files.list(d).iterator().asScala
      .filter(p => Files.isDirectory(p) && !GraftTable.exists(p.toString))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
  }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!Files.isDirectory(nsDir(namespace))) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    Files.createDirectories(nsDir(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = nsDir(namespace)
    if (!Files.isDirectory(d)) throw new NoSuchNamespaceException(namespace)
    if (!cascade && Files.list(d).iterator().hasNext)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    GraftTable.drop(d.toString)
    true
  }
}
