package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: SparkEntry.entry rows > 0 on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.sources.GraftExtensions())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows = $n (require > 0)")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
