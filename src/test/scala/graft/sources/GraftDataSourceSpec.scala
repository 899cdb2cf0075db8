package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.storage.GraftTable

/** The reference's end-user SQL contract through the DSv2 connector:
  * CREATE TABLE USING graft → INSERT → SELECT (with pushdown) →
  * INSERT OVERWRITE → DROP. */
class GraftDataSourceSpec extends SparkSpec {

  test("SQL DDL + DML round-trip (reference README.md:74 contract)") {
    val loc = tmpDir("dsv2") + "/t"
    spark.sql(s"CREATE TABLE graft_t (a INT, b STRING) USING graft " +
      s"OPTIONS (path '$loc', compression 'zstd', stripe_row_count '150000')")
    try {
      // empty table queryable (N18)
      assert(spark.sql("SELECT count(*) c FROM graft_t").collect().head.getLong(0) === 0)
      spark.sql("INSERT INTO graft_t VALUES (1, 'x'), (2, 'y'), (3, 'z')")
      assert(spark.sql("SELECT count(*) c FROM graft_t").collect().head.getLong(0) === 3)
      // append accumulates (reference append-only semantics)
      spark.sql("INSERT INTO graft_t SELECT a + 10, b FROM graft_t")
      assert(spark.table("graft_t").count() === 6)
      // predicate + projection work through the delegated parquet scan
      val got = spark.sql("SELECT b FROM graft_t WHERE a > 10 ORDER BY b")
        .collect().map(_.getString(0)).toSeq
      assert(got === Seq("x", "y", "z"))
      // filters reach the parquet scan
      val plan = spark.sql("SELECT b FROM graft_t WHERE a > 10")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters"), plan)
      assert(plan.contains("GreaterThan(a,10)"), plan)
      // INSERT OVERWRITE = truncate + append
      spark.sql("INSERT OVERWRITE graft_t VALUES (9, 'only')")
      assert(spark.table("graft_t").collect().map(r => (r.getInt(0), r.getString(1)))
        .toSeq === Seq((9, "only")))
      // the writes went through the graft metadata protocol
      val t = GraftTable.open(spark, loc)
      assert(t.rowCountFromMetadata() === 1)
      assert(t.options.compression === "zstd")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_t")
      GraftTable.drop(loc)
    }
  }

  test("DataFrame read/write API: format(\"graft\")") {
    import spark.implicits._
    val loc = tmpDir("dsv2-df") + "/t"
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    df.write.format("graft").mode("append").save(loc)
    try {
      val back = spark.read.format("graft").load(loc)
      assert(back.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
        .toSeq === Seq((1, "a"), (2, "b")))
      // second append doubles (block_filtering.source:54-58 semantics)
      df.write.format("graft").mode("append").save(loc)
      assert(spark.read.format("graft").load(loc).count() === 4)
      // overwrite truncates first
      df.write.format("graft").mode("overwrite").save(loc)
      assert(spark.read.format("graft").load(loc).count() === 2)
    } finally GraftTable.drop(loc)
  }

  test("invalid options are rejected at CREATE (N22)") {
    val loc = tmpDir("dsv2-bad") + "/t"
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft_bad (a INT) USING graft " +
        s"OPTIONS (path '$loc', stripe_row_count '10')")
      spark.table("graft_bad").count()
    }
    assert(e.getMessage.contains("stripe_row_count") ||
      e.getCause != null && e.getCause.getMessage.contains("stripe_row_count"))
    spark.sql("DROP TABLE IF EXISTS graft_bad")
  }
}
