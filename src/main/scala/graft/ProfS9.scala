package graft
import org.apache.spark.sql.SparkSession

/** Solo 10× scale profile for the composed IVF-PQ index (s9) and its
  * components: index build + probe walls at sf0.1 and at the 10×
  * key-replicated copy (MakeScale output), same session, warm tables. */
object ProfS9 {
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
    for (dir <- args.toSeq) {
      println(s"== $dir")
      t("warm tables")(Tables.load(spark, dir, "embeddings").count())
      t("s9 index build (cold)")({ operators.Similarity.ivfPqIndexDir(spark, dir); 1L })
      t("s9 probe (warm index)")(operators.Similarity.s9AnnIvfPq(spark, dir).count())
      t("s9 probe again")(operators.Similarity.s9AnnIvfPq(spark, dir).count())
      t("s7 probe (warm index)")(operators.Similarity.s7AnnPersisted(spark, dir).count())
      t("s5 pq (memoized codebook)")(operators.Similarity.s5PqAnn(spark, dir).count())
    }
    spark.stop()
  }
}
