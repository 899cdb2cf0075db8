package graft
import org.apache.spark.sql.SparkSession

/** Solo timings for the bench's heaviest queries at sf0.1/local[32] —
  * isolates real per-query cost from bench-concurrency queue time. */
object ProfHeavy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.all.foreach(t => Tables.load(spark, dir, t).count())
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d7_dedup_clusters", "d6_embed_neardup_ann", "s5_pq_ann",
        "d2b_ngram_capped", "d4_simhash", "d5_embed_neardup",
        "d3_minhash_lsh", "d9_edit_distance", "d10_containment",
        "d11_semantic_dedup", "t11_bpe_tokens", "p2_training_prep",
        "m4_png_decode", "m6_wav_decode", "s4_kmeans", "p1_clean_corpus",
        // round-8/9 additions: persisted-index probe, the mutation
        // suite's heavy ends, decontamination, and the stream twins
        "s7_ann_persisted", "n9_agg_maintain", "n13_sql_mor_merge",
        "n17_cdc_apply", "c9_bloom_decontaminate", "c8_cluster_split",
        "d13_tfidf_cosine", "e12_stream_trending", "q44_topk_revenue",
        "q45_having_join")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      println(f"[prof] $n%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$rows")
    }
    spark.stop()
  }
}
