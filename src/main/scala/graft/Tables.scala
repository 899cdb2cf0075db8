package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver-generated parquet test data (TESTDATA.md).
  *
  * The reference (cstore_fdw) binds a PostgreSQL foreign table to one
  * columnar data file (`/root/reference/cstore_fdw.c:956-979`); here a
  * table name binds to one parquet file/directory under the scale-factor
  * dir. Reads go through Spark's vectorized parquet reader, which supplies
  * the reference's storage value-adds natively: column projection
  * (`cstore_fdw.c:1841-1941`), min/max block skipping
  * (`cstore_reader.c:744-806`), and per-block compression
  * (`cstore_compression.c:63-106`).
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extra: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = tpch ++ extra

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
