package graft
import org.apache.spark.sql.SparkSession

/** 100× solo profile — the "would the plan survive 100×?" question
  * answered empirically on a 1.6 GB key-replicated copy of sf0.1:
  * flagship join/agg queries, the persisted-index ANN probe, the
  * mixing/text operators whose scale story SCALE_r13 argues. */
object ProfScale100 {
  def t(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"[prof] $name%-22s ${(System.nanoTime()-t0)/1e9}%7.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").config(Tables.sessionConfs).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq) {
      println(s"== $dir")
      t("warm")(Tables.load(spark, dir, "lineitem").count())
      t("q01_count")(queries.CoreQueries.q01Count(spark, dir).count())
      t("q32_tpch_q1")(queries.ExtendedQueries.q32TpchQ1(spark, dir).count())
      t("q44_topk_revenue")(queries.ExtendedQueries.q44TopkRevenue(spark, dir).count())
      t("q45_having_join")(queries.ExtendedQueries.q45HavingJoin(spark, dir).count())
      t("q11_multi_join")(queries.CoreQueries.q11MultiJoin(spark, dir).count())
      t("s9 index build")({ operators.Similarity.ivfPqIndexDir(spark, dir); 1L })
      t("s9 probe")(operators.Similarity.s9AnnIvfPq(spark, dir).count())
      t("s9 probe warm")(operators.Similarity.s9AnnIvfPq(spark, dir).count())
      t("c13_epoch_mix")(operators.Sampling.c13EpochMix(spark, dir).count())
      t("t3_lang_id")(operators.TextAnalysis.t3LangId(spark, dir).count())
      t("d1_exact_dedup")(operators.Dedup.d1ExactDedup(spark, dir).count())
      // heaviest per family (VERDICT r10 #7): banded TF-IDF postings,
      // cluster split over d7's collapse, real-codec video, MoR merge,
      // watermark-drained stream grid
      t("d13_tfidf_cosine")(operators.Dedup.d13TfidfCosine(spark, dir).count())
      t("c8_cluster_split")(operators.Sampling.c8ClusterSplit(spark, dir).count())
      t("m7_avi_decode")(operators.Multimodal.m7AviDecode(spark, dir).count())
      t("n13_sql_mor_merge")(queries.MutationQueries.n13SqlMorMerge(spark, dir).count())
      t("e12_stream_trending")(queries.StreamQueries.e12StreamTrending(spark, dir).count())
      // round 12 additions: span dedup (posting pairs + diagonal
      // windows) and the eval-side contamination report (broadcast
      // eval set, corpus never shuffles)
      t("d14_span_dedup")(operators.Dedup.d14SpanDedup(spark, dir).count())
      t("d15_incr_spans")(operators.Dedup.d15IncrementalSpans(spark, dir).count())
      t("c15_contamination")(operators.Sampling.c15ContaminationReport(spark, dir).count())
      t("q49_anti_avg")(queries.ExtendedQueries.q49AntiAvg(spark, dir).count())
      // late round 12: the window-decorrelated Q17 (one keyed shuffle),
      // the reduction-ordered Q7 multiway, Q13's outer-join count
      // distribution, and the distilled token-vote model (train+apply)
      t("q54_small_qty")(queries.ExtendedQueries.q54SmallQtyRevenue(spark, dir).count())
      t("q57_volume_shipping")(queries.ExtendedQueries.q57VolumeShipping(spark, dir).count())
      t("q53_cust_distribution")(queries.ExtendedQueries.q53CustDistribution(spark, dir).count())
      t("t17_token_votes")(operators.TextAnalysis.t17TokenVotes(spark, dir).count())
      // int8 rung: in-memory brute force (one corpus scan per query
      // batch), the persisted probe (~1/nlist code files + bounded
      // re-rank), and label-filtered hard negatives (s1's shape)
      t("s15_int8_ann")(operators.Similarity.s15Int8Ann(spark, dir).count())
      t("s17 index build")({ operators.Similarity.int8IndexDir(spark, dir); 1L })
      t("s17 probe warm")(operators.Similarity.s17AnnInt8Persisted(spark, dir).count())
      t("s16_hard_negatives")(operators.Similarity.s16HardNegatives(spark, dir).count())
      t("s18_binary_ann")(operators.Similarity.s18BinaryAnn(spark, dir).count())
      // round-12 continuation: the multi-probe dial (3× the probed
      // lists of the warm s7 probe, same index) and the per-source
      // datasheet (one md5 window + one per-source aggregate)
      t("s20_multiprobe")(operators.Similarity.s20MultiprobeIvf(spark, dir).count())
      t("s20 warm")(operators.Similarity.s20MultiprobeIvf(spark, dir).count())
      t("c16_dataset_card")(operators.Sampling.c16DatasetCard(spark, dir).count())
      // continuation entries: quota retrieval (s1's scan + two keyed
      // windows), curriculum rank (band decomposition), dense grid
      // (grid-sized fill), index-served RAG (probe + bounded greedy)
      t("s21_quota")(operators.Similarity.s21QuotaRetrieval(spark, dir).count())
      t("c17_curriculum")(operators.Sampling.c17Curriculum(spark, dir).count())
      t("e13_dense_grid")(operators.Events.e13DenseGrid(spark, dir).count())
      t("p5_rag_served")(operators.Similarity.p5RagServed(spark, dir).count())
      // round 13: the banded containment join — both sides scale with
      // the corpus (sessions AND probe events), so the keyed band join
      // is the part that must stay linear
      t("e14_range_join")(operators.Events.e14RangeJoin(spark, dir).count())
      // round 13: pHash near-dup — decode pass ∝ corpus, banded join
      // ∝ collision mass
      t("m8_phash_neardup")(operators.Multimodal.m8PhashNeardup(spark, dir).count())
      t("m9_audio_neardup")(operators.Multimodal.m9AudioNeardup(spark, dir).count())
    }
    spark.stop()
  }
}
