package graft.storage

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** CHECK constraints — declarative data-quality gates enforced at the
  * COMMIT boundary of every value-introducing write: a violating write
  * commits NOTHING (table state, row count, and version are untouched).
  * SQL CHECK semantics: NULL passes, only FALSE violates. The cost is
  * one scan of the staged files per write — ∝ data written, never table
  * size. */
class GraftCheckSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType), StructField("v", DoubleType),
    StructField("tag", StringType)))

  private def mk(prefix: String, checks: Map[String, String]): GraftTable =
    GraftTable.create(spark, tmpDir(prefix) + "/t", schema,
      GraftTableOptions(checks = checks))

  private def rows(t: (Int, java.lang.Double, String)*) = {
    import spark.implicits._
    t.toDF("id", "v", "tag")
  }

  test("append: violating batch refused atomically; NULL passes") {
    val t = mk("chk-append", Map("pos" -> "v >= 0"))
    assert(t.append(rows((1, 1.0, "a"), (2, null, "b"))) === 2L) // NULL passes
    val v = t.version
    val e = intercept[IllegalArgumentException] {
      t.append(rows((3, 5.0, "c"), (4, -1.0, "d")))
    }
    assert(e.getMessage.contains("pos"))
    assert(t.read().count() === 2L, "nothing from the refused batch commits")
    assert(t.version === v, "a refused append must not commit a version")
    assert(t.rowCountFromMetadata() === 2L)
    // the staged batch was reclaimed eagerly — no orphan dirs to vacuum
    assert(t.vacuum() === 0)
    GraftTable.drop(t.location)
  }

  test("multiple constraints report the violated one") {
    val t = mk("chk-multi", Map("pos" -> "v >= 0", "tagged" -> "length(tag) > 0"))
    val e = intercept[IllegalArgumentException] {
      t.append(rows((1, 1.0, "")))
    }
    assert(e.getMessage.contains("tagged") && !e.getMessage.contains("'pos'"))
    GraftTable.drop(t.location)
  }

  test("COW UPDATE and MERGE re-validate changed values; DELETE is exempt") {
    import spark.implicits._
    val t = mk("chk-dml", Map("pos" -> "v >= 0"))
    t.append(rows((1, 1.0, "a"), (2, 2.0, "b"), (3, 3.0, "c")))
    val e = intercept[IllegalArgumentException] {
      t.update(Map("v" -> (col("v") - lit(10.0))),
        Seq(org.apache.spark.sql.sources.EqualTo("id", 2)))
    }
    assert(e.getMessage.contains("pos"))
    assert(t.read().filter(col("v") < 0).count() === 0L)
    intercept[IllegalArgumentException] {
      t.merge(Seq((2, -5.0, "b")).toDF("id", "v", "tag"), Seq("id"))
    }
    assert(t.read().filter(col("v") < 0).count() === 0L)
    // a merge carrying a violating INSERT alongside an update exercises
    // the two-dir (rewrite + insert) path — both staged dirs must be
    // reclaimed eagerly, like the refused append's
    intercept[IllegalArgumentException] {
      t.merge(Seq((2, 5.0, "b"), (99, -1.0, "z")).toDF("id", "v", "tag"), Seq("id"))
    }
    assert(t.read().count() === 3L)
    assert(t.vacuum() === 0,
      "refused UPDATE/MERGE batches must be reclaimed eagerly, not linger for vacuum")
    // compliant update passes; delete never re-validates values
    t.update(Map("v" -> (col("v") + lit(10.0))),
      Seq(org.apache.spark.sql.sources.EqualTo("id", 2)))
    t.delete(Seq(org.apache.spark.sql.sources.EqualTo("id", 1)))
    assert(t.read().count() === 2L)
    GraftTable.drop(t.location)
  }

  test("merge-on-read UPDATE enforces before any sidecar lands") {
    val t = mk("chk-mor", Map("pos" -> "v >= 0"))
    t.append(rows((1, 1.0, "a"), (2, 2.0, "b")))
    intercept[IllegalArgumentException] {
      t.updateMor(Map("v" -> (col("v") - lit(10.0))),
        Seq(org.apache.spark.sql.sources.EqualTo("id", 1)))
    }
    assert(t.dvEntries.isEmpty, "a refused MOR update must leave no vectors")
    assert(t.read().count() === 2L)
    GraftTable.drop(t.location)
  }

  test("addCheck validates existing data; dropCheck re-admits") {
    val t = mk("chk-alter", Map.empty)
    t.append(rows((1, -1.0, "a")))
    val e = intercept[Exception] { t.addCheck("pos", "v >= 0") }
    assert(e.getMessage.contains("existing rows violate"))
    t.delete(Seq(org.apache.spark.sql.sources.EqualTo("id", 1)))
    t.addCheck("pos", "v >= 0")
    intercept[IllegalArgumentException] { t.append(rows((2, -2.0, "b"))) }
    t.dropCheck("pos")
    assert(t.append(rows((2, -2.0, "b"))) === 1L)
    GraftTable.drop(t.location)
  }

  test("malformed constraints are refused at declaration time") {
    val t = mk("chk-bad", Map.empty)
    // non-boolean
    intercept[IllegalArgumentException] { t.addCheck("c1", "v + 1") }
    // aggregate
    intercept[IllegalArgumentException] { t.addCheck("c2", "max(v) > 0") }
    // nondeterministic
    intercept[IllegalArgumentException] { t.addCheck("c3", "rand() > 0.5") }
    // unknown column
    intercept[IllegalArgumentException] { t.addCheck("c4", "nosuch > 0") }
    // window function: analysis rewrites it to Project-over-Window, so
    // a top-level-Project gate alone would admit it — on an EMPTY table
    // (no existing-row scan) it would commit and then poison every
    // subsequent write (windows are not allowed in filters). Must be
    // refused at declaration time instead.
    intercept[IllegalArgumentException] {
      t.addCheck("c5", "row_number() over (order by v) > 0")
    }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("chk-bad3") + "/t", schema,
        GraftTableOptions(checks =
          Map("w" -> "count(*) over (partition by tag) > 0")))
    }
    // CREATE with an unresolvable check
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpDir("chk-bad2") + "/t", schema,
        GraftTableOptions(checks = Map("x" -> "nosuch > 0")))
    }
    GraftTable.drop(t.location)
  }

  test("schema changes that would break a constraint are refused") {
    val t = mk("chk-schema", Map("pos" -> "v >= 0"))
    t.append(rows((1, 1.0, "a")))
    val e = intercept[Exception] { t.dropColumn("v") }
    assert(e.getMessage.contains("pos"))
    val r = intercept[IllegalArgumentException] { t.renameColumn("v", "w") }
    assert(r.getMessage.contains("drop the constraint"))
    // widening the column keeps the expression valid — allowed
    t.dropColumn("tag") // unreferenced column drops fine
    assert(t.read().schema.fieldNames.toSeq === Seq("id", "v"))
    GraftTable.drop(t.location)
  }

  test("SQL lifecycle: CREATE with check, INSERT/UPDATE/MERGE refused, UNSET re-admits") {
    val wh = tmpDir("chk-sql")
    spark.conf.set("spark.sql.catalog.gck", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gck.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gck.db.c (id INT, v DOUBLE) USING graft " +
        "TBLPROPERTIES ('check.pos' = 'v >= 0')")
      spark.sql("INSERT INTO gck.db.c VALUES (1, 1.0), (2, 2.0)")
      val e = intercept[Exception] {
        spark.sql("INSERT INTO gck.db.c VALUES (3, -3.0)")
      }
      assert(e.getMessage.contains("pos"))
      assert(spark.table("gck.db.c").count() === 2L)
      intercept[Exception] {
        spark.sql("UPDATE gck.db.c SET v = v - 100 WHERE id = 1")
      }
      assert(spark.table("gck.db.c").filter("v < 0").count() === 0L)
      spark.sql("SELECT 2 AS id, CAST(-9 AS DOUBLE) AS v")
        .createOrReplaceTempView("chk_src")
      intercept[Exception] {
        spark.sql("""MERGE INTO gck.db.c t USING chk_src s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.v""")
      }
      assert(spark.table("gck.db.c").filter("v < 0").count() === 0L)
      // adding a second check over violating data is refused
      intercept[Exception] {
        spark.sql("ALTER TABLE gck.db.c SET TBLPROPERTIES ('check.big' = 'v >= 2')")
      }
      spark.sql("ALTER TABLE gck.db.c UNSET TBLPROPERTIES ('check.pos')")
      spark.sql("INSERT INTO gck.db.c VALUES (3, -3.0)")
      assert(spark.table("gck.db.c").count() === 3L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gck.db.c")
      spark.conf.unset("spark.sql.catalog.gck")
    }
  }

  test("delta DML (merge-on-read SQL) enforces on reinserted versions") {
    val wh = tmpDir("chk-delta")
    spark.conf.set("spark.sql.catalog.gcd", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcd.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gcd.db.d (id INT, v DOUBLE) USING graft " +
        "TBLPROPERTIES ('check.pos' = 'v >= 0', 'delete_mode' = 'merge-on-read')")
      spark.sql("INSERT INTO gcd.db.d VALUES (1, 1.0), (2, 2.0)")
      intercept[Exception] {
        spark.sql("UPDATE gcd.db.d SET v = v - 100 WHERE id = 1")
      }
      val t = GraftTable.open(spark, s"$wh/db/d")
      assert(t.dvEntries.isEmpty, "refused delta DML must leave no vectors")
      assert(spark.table("gcd.db.d").filter("v < 0").count() === 0L)
      // compliant delta update still works
      spark.sql("UPDATE gcd.db.d SET v = v + 100 WHERE id = 1")
      assert(spark.table("gcd.db.d").filter("v > 100").count() === 1L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcd.db.d")
      spark.conf.unset("spark.sql.catalog.gcd")
    }
  }

  test("SHOW TBLPROPERTIES displays constraints; writer-path create enforces them") {
    val wh = tmpDir("chk-props")
    spark.conf.set("spark.sql.catalog.gcp", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcp.warehouse", wh)
    try {
      spark.sql("CREATE TABLE gcp.db.p (id INT, v DOUBLE) USING graft " +
        "TBLPROPERTIES ('check.pos' = 'v >= 0')")
      val props = spark.sql("SHOW TBLPROPERTIES gcp.db.p").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("check.pos").contains("v >= 0"),
        s"constraint must display; got $props")
      assert(props.get("delete_mode").contains("copy-on-write"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS gcp.db.p")
      spark.conf.unset("spark.sql.catalog.gcp")
    }
    // the DataFrameWriter path creates with the same option surface
    import spark.implicits._
    val loc = tmpDir("chk-writer") + "/t"
    Seq((1, 1.0)).toDF("id", "v").write.format("graft").mode("append")
      .option("check.pos", "v >= 0").save(loc)
    val t = GraftTable.open(spark, loc)
    intercept[IllegalArgumentException] {
      t.append(Seq((2, -1.0)).toDF("id", "v"))
    }
    assert(t.read().count() === 1L)
    GraftTable.drop(loc)
  }

  test("clone and restore carry the constraint state") {
    val t = mk("chk-clone", Map("pos" -> "v >= 0"))
    t.append(rows((1, 1.0, "a")))
    val c = t.cloneTo(tmpDir("chk-clone-dst") + "/t")
    intercept[IllegalArgumentException] { c.append(rows((2, -1.0, "b"))) }
    // restore to the pre-check snapshot rolls the constraint back too
    val v0 = t.version
    t.dropCheck("pos")
    t.append(rows((9, -9.0, "z")))
    t.restore(v0) // the -9 row AND the check-free state both roll back
    intercept[IllegalArgumentException] { t.append(rows((3, -1.0, "c"))) }
    assert(t.read().count() === 1L)
    GraftTable.drop(t.location)
    GraftTable.drop(c.location)
  }
}
