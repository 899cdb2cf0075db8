package graft.storage

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Change data feed computed from the commit history: per-commit
  * insert/delete rows, multiplicity- and NULL-exact, reading only the
  * files each commit swapped. */
class ChangeFeedSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", IntegerType), StructField("v", StringType)))

  private def feed(t: GraftTable, from: Long, to: Long): Set[(Int, String, String, Long)] =
    t.changes(from, to)
      .collect()
      .map(r => (r.getInt(0), r.getString(1),
        r.getString(r.fieldIndex("_change_type")),
        r.getLong(r.fieldIndex("_commit_version"))))
      .toSet

  test("append, delete, update, merge each feed their exact row changes") {
    import spark.implicits._
    val loc = tmpDir("cdf") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    val v0 = t.version

    t.append(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")) // v0+1
    val v1 = t.version
    assert(feed(t, v0, v1) === Set(
      (1, "a", "insert", v1), (2, "b", "insert", v1), (3, "c", "insert", v1)))

    assert(t.delete(Seq(org.apache.spark.sql.sources.EqualTo("k", Integer.valueOf(2)))) === 1L)
    val v2 = t.version
    // the rewrite carried k=1,k=3 — they must cancel; only k=2 feeds
    assert(feed(t, v1, v2) === Set((2, "b", "delete", v2)))

    assert(t.update(Map("v" -> lit("A")),
      Seq(org.apache.spark.sql.sources.EqualTo("k", Integer.valueOf(1)))) === 1L)
    val v3 = t.version
    assert(feed(t, v2, v3) === Set(
      (1, "a", "delete", v3), (1, "A", "insert", v3)))

    t.merge(Seq((3, "c2"), (9, "n9")).toDF("k", "v"), Seq("k"))
    val v4 = t.version
    assert(feed(t, v3, v4) === Set(
      (3, "c", "delete", v4), (3, "c2", "insert", v4), (9, "n9", "insert", v4)))

    // the whole range composes
    assert(feed(t, v0, v4).count(_._3 == "insert") === 3 + 1 + 2)
    GraftTable.drop(loc)
  }

  test("multiplicity and NULLs diff exactly; compaction feeds nothing") {
    import spark.implicits._
    val loc = tmpDir("cdf-mult") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    // duplicates and a NULL-keyed row
    t.append(Seq((1, "x"), (1, "x"), (1, "x")).toDF("k", "v")
      .unionByName(Seq(("x")).toDF("v").withColumn("k", lit(null).cast("int"))
        .select("k", "v")))
    val v1 = t.version
    // delete ONE copy's worth? row-level delete removes all matching —
    // instead rewrite via merge on a table state: delete k=1 removes all
    // three copies; the feed must carry multiplicity 3
    assert(t.delete(Seq(org.apache.spark.sql.sources.EqualTo("k", Integer.valueOf(1)))) === 3L)
    val v2 = t.version
    val rows = t.changes(v1, v2).collect()
    assert(rows.length === 3, s"3 deleted copies must feed 3 rows, got ${rows.length}")
    assert(rows.forall(r => r.getInt(0) == 1 && r.getString(2) == "delete"))
    // the NULL-keyed row was carried through the rewrite and must cancel
    assert(!t.changes(v1, v2).collect().exists(_.isNullAt(0)))

    // compaction: rows unchanged -> empty feed (at scan cost)
    t.append(Seq((5, "e")).toDF("k", "v"))
    val v3 = t.version
    t.compact()
    val v4 = t.version
    if (v4 > v3) assert(t.changes(v3, v4).count() === 0L)
    GraftTable.drop(loc)
  }

  test("range guards: unretained snapshots and mid-range ALTER fail clearly") {
    import spark.implicits._
    val loc = tmpDir("cdf-guard") + "/t"
    val t = GraftTable.create(spark, loc, schema)
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"))
    t.append(Seq((3, "c")).toDF("k", "v"))
    val head = t.version
    t.expireHistory(keepLast = 1)
    val e1 = intercept[IllegalStateException](t.changes(0L, head))
    assert(e1.getMessage.contains("expired"))

    t.addColumn("w", IntegerType, 7)
    t.append(Seq((4, "d", 4)).toDF("k", "v", "w"))
    val e2 = intercept[IllegalArgumentException](
      t.changes(head, t.version))
    assert(e2.getMessage.contains("schema changed"))
    // a post-ALTER range works, defaults synthesized for pre-ALTER files
    val after = t.changes(t.version - 1, t.version).collect()
    assert(after.length === 1 && after.head.getInt(2) === 4)
    GraftTable.drop(loc)
  }
}
