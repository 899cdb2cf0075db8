package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object Prof {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    t("warmup")(docs.count())
    t("scan")(docs.count())
    t("tokens size")(docs.select(size(split(col("text")," ")).as("n")).agg(sum("n")).count())
    t("shinglesAll explode")(docs.select(explode(shinglesAll(col("text"))).as("s")).count())
    t("shingleRows distinct")(docs.select(col("doc_id"), explode(shinglesAll(col("text"))).as("s")).distinct().count())
    val sh = docs.select(col("doc_id"), explode(shinglesAll(col("text"))).as("s")).distinct()
    t("groupBy(s) postings")(sh.groupBy("s").agg(sort_array(collect_list(col("doc_id"))).as("ds")).count())
    t("d2 full")(graft.operators.Dedup.d2NgramJaccard(spark, dir).count())
    t("d4 full")(graft.operators.Dedup.d4Simhash(spark, dir).count())
    spark.stop()
  }
}
