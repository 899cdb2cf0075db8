package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.GraftTable

/** Scale profile of storage-partitioned joins: two fact tables
  * co-bucketed (+ sort-clustered) on the customer key, joined with SPJ
  * planning on vs off. The claim under test is the 100 TB one — the
  * co-located join's cost is the scan, not a shuffle of both sides —
  * so the interesting numbers are the SPJ:shuffled wall ratio and how
  * it moves as the table grows 10×.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProfSpj 10"
  *
  * arg = replication factor: rep copies of orders under shifted
  * customer-key ranges (fresh keys, the way a growing fact table
  * behaves). Prints per-step walls + a one-line summary.
  */
object ProfSpj {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = args.headOption.map(_.toInt).getOrElse(1)
    val buckets = 32

    val wh = java.nio.file.Files.createTempDirectory("graft_profspj").toString
    spark.conf.set("spark.sql.catalog.pspj", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.pspj.warehouse", wh)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profspj] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val o0 = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val shift = o0.agg(max("o_custkey")).head.getLong(0) + 1
    val orders = (0 until rep).map(i =>
      o0.withColumn("o_custkey", col("o_custkey") + lit(i * shift))
        .withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong << 40)))
      .reduce(_ unionByName _)

    spark.sql(s"CREATE TABLE pspj.db.facts (o_orderkey BIGINT, o_custkey BIGINT, " +
      s"o_totalprice DOUBLE) USING graft CLUSTERED BY (o_custkey) INTO $buckets BUCKETS " +
      "OPTIONS (sort_by 'o_custkey')")
    spark.sql(s"CREATE TABLE pspj.db.cust_agg (o_custkey BIGINT, n BIGINT, " +
      s"total DOUBLE) USING graft CLUSTERED BY (o_custkey) INTO $buckets BUCKETS " +
      "OPTIONS (sort_by 'o_custkey')")
    timed(s"load facts (rep=$rep)") {
      orders.writeTo("pspj.db.facts").append()
    }
    timed("load cust_agg (bucket-local agg of facts)") {
      // reading back from the bucketed table: the groupBy itself is
      // shuffle-free (KeyGroupedPartitioning covers the distribution)
      spark.table("pspj.db.facts").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
        .writeTo("pspj.db.cust_agg").append()
    }
    val t = GraftTable.open(spark, s"$wh/db/facts")
    println(s"[profspj] facts: ${t.rowCountFromMetadata()} rows, " +
      s"${t.committedFiles.size} files, $buckets buckets")

    val joinSql = "SELECT a.o_orderkey, a.o_totalprice, b.n, b.total " +
      "FROM pspj.db.facts a JOIN pspj.db.cust_agg b ON a.o_custkey = b.o_custkey"
    def run(label: String, spj: Boolean): Double = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      // warm once (file listing, footers), then measure
      spark.sql(joinSql).queryExecution.executedPlan
      timed(label) { spark.sql(joinSql).write.format("noop").mode("overwrite").save() }
      val t0 = System.nanoTime()
      spark.sql(joinSql).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val wallSpj = run("fact-fact join, SPJ (no shuffle, no sort)", spj = true)
    val wallShuf = run("fact-fact join, shuffled (v2 bucketing off)", spj = false)
    println(f"[profspj] SUMMARY rep=$rep spj=$wallSpj%.2fs shuffled=$wallShuf%.2fs " +
      f"ratio=${wallShuf / wallSpj}%.2fx")
    spark.stop()
  }
}
