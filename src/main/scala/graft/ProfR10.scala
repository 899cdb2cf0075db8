package graft
import org.apache.spark.sql.SparkSession

/** Solo 10× scale profile of the round-10 additions (s10/s11/c13/m7 +
  * q45's reordered join) — sf0.1 vs the MakeScale 10× copy, warm
  * tables, one session. */
object ProfR10 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-24s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq) {
      println(s"== $dir")
      t("warm")(Tables.load(spark, dir, "documents").count() +
        Tables.load(spark, dir, "embeddings").count() +
        Tables.load(spark, dir, "orders").count())
      t("s10_filtered_ann")(operators.Similarity.s10FilteredAnn(spark, dir).count())
      t("s10 again (warm)")(operators.Similarity.s10FilteredAnn(spark, dir).count())
      t("s11_filtered_ivf")(operators.Similarity.s11FilteredIvf(spark, dir).count())
      t("s11 again (warm)")(operators.Similarity.s11FilteredIvf(spark, dir).count())
      t("c13_epoch_mix")(operators.Sampling.c13EpochMix(spark, dir).count())
      t("m7_avi_decode")(operators.Multimodal.m7AviDecode(spark, dir).count())
      t("q45_having_join")(queries.ExtendedQueries.q45HavingJoin(spark, dir).count())
    }
    spark.stop()
  }
}
