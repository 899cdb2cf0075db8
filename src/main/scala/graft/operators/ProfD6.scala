package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfD6 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").config(graft.Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val e = Similarity.normalized(graft.Tables.load(spark, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("nrm"))
    t("warmup scan")(e.count())
    val banded = e.select(col("vec_id"), col("v"), col("nrm"),
      explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn("bk", (0 until 8).foldLeft(lit(0L)) { (acc, b) =>
        when(col("band") === b, Similarity.signKey(col("v"), b * 6, 6)).otherwise(acc) })
    t("banded keys")(banded.count())
    val bp = banded.persist()
    t("banded persist")(bp.count())
    val joined = bp.as("a").join(bp.as("b"),
      col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
        col("a.vec_id") < col("b.vec_id"))
    t("join count (persisted)")(joined.count())
    t("d6 full (unpersisted plan)")(Dedup.d6EmbedNearDupAnn(spark, dir).count())
    bp.unpersist()
    spark.stop()
  }
}
