package graft

import graft.operators.Dedup

/** Plan-shape regression guard over the ENTIRE query surface: no query
  * may plan a CartesianProduct, and BroadcastNestedLoopJoin is allowed
  * only where it is the intended shape (s1/s2 broadcast a ≤5-row query
  * set against the corpus with a non-equi condition). A future edit that
  * silently degrades a join into an all-pairs scan fails here, not at
  * 100 TB. */
class PlanGuardSpec extends SparkSpec {

  // s1/s2: tiny broadcast query-set joined on =!= / crossJoin — intended.
  // t6: ONE-row corpus-stats aggregate broadcast-crossed onto the
  // scoring pass — the standard broadcast-scalar pattern.
  // c3: ONE-row totals aggregate broadcast-crossed onto 20 source rows.
  // s4: k-row centroid tables broadcast-crossed onto the corpus scan.
  // d11 rides s4's broadcast-centroid assignment, same intended shape.
  // t13: ONE-row vocabulary-size aggregate broadcast-crossed onto the
  // per-bigram cost table (t6's broadcast-scalar pattern); the instance
  // scoring join itself is a keyed equality join on the bigram.
  // d13: ONE-row corpus-size aggregate broadcast-crossed onto the
  // df-band term table (same broadcast-scalar pattern); candidate pairs
  // come from the posting-list expansion, no join at all.
  // c11: ONE-row (total tokens, weight sum) aggregate broadcast-crossed
  // onto the per-source budget table (c3's broadcast-scalar pattern);
  // the corpus-side joins are keyed equality joins on (source, salt).
  // s7: s2's assignment crossJoin served from the persisted index — the
  // same ≤5-row query set broadcast against the tiny centroid table.
  // s8: the semantic signal is s1's exact shape (≤5-row broadcast query
  // set, =!= condition); the lexical signal and the fusion join are
  // keyed equality joins.
  // s9: s7's assignment crossJoin (≤5-row query set × tiny committed
  // centroid table); the ADC candidate join and the re-rank fetch are
  // keyed equality joins over zone-map-pruned files.
  // s10: s1's exact shape over the pre-filtered universe (≤5-row
  // broadcast query set, =!= condition); the metadata pre-filter itself
  // is a keyed LEFT SEMI equality join (spec-pinned in RetrievalSpec).
  private val bnljAllowed =
    Set("s1_ann_brute", "s2_ann_ivf", "s6_range_search", "t6_bm25",
      "c3_source_mix", "s4_kmeans", "d11_semantic_dedup", "t13_perplexity",
      "d13_tfidf_cosine", "c11_token_budget_mix", "s7_ann_persisted",
      "s8_hybrid_retrieval", "s9_ann_ivfpq", "s10_filtered_ann",
      // s11: s2's assignment crossJoin; the filter is a keyed semi join
      // c13: c3's ONE-row totals aggregate broadcast-crossed per source
      // s12: s7's assignment crossJoin (≤5-row query set × tiny
      // committed centroid table); the filter lands as a keyed LEFT
      // SEMI equality join on the probed-list scan (AnnIndexSpec pins
      // candidates ⊆ filter and probed-lists-only)
      // s13: the candidate POOL is s1's exact shape (≤5-row broadcast
      // query set, =!= condition); the greedy touches only MmrPool
      // rows per query inside flatMapGroups
      // c14: c3's ONE-row totals crossJoin over the decontaminated
      // corpus (the flag exclusion itself is a keyed left-anti join)
      // p4: s13's pool shape over the filtered universe (≤5-row
      // broadcast query set; the filter is a keyed semi join, the
      // token join a keyed equality join)
      // s14: s9's assignment crossJoin over the committed centroid
      // table; the filter is a keyed semi join on the codes scan
      // q49: ONE-row (Σcents, n) threshold aggregate broadcast-crossed
      // onto customer (the t6/c3 broadcast-scalar pattern); the orders
      // exclusion is a keyed LEFT ANTI equality join
      // q55: ONE-row max-revenue aggregate broadcast-crossed onto the
      // 100-row per-supplier aggregate (q49's broadcast-scalar pattern)
      "s11_filtered_ivf", "c13_epoch_mix", "s12_filtered_persisted",
      "s13_mmr_diversify", "c14_decontaminated_mix", "p4_rag_context",
      // t17: ONE-row (n1, n0) class-totals aggregate broadcast-crossed
      // onto the vocab-sized token-count aggregate (the q49 pattern)
      // s15: ONE-row global-scale aggregate broadcast-crossed onto the
      // corpus scan (the t6/c3 broadcast-scalar pattern), then s1's
      // ≤5-row broadcast query set joined on =!=
      // s16: s1's ≤5-row broadcast query set, the non-equi condition is
      // the label INEQUALITY itself (hard negatives = different label)
      // s17: s7/s9's assignment crossJoin (≤5-row query set × tiny
      // committed centroid table) plus the one-row committed-scale
      // crossJoin onto the query batch; the shortlist and re-rank
      // joins are keyed equality joins over zone-map-pruned files
      "s14_filtered_ivfpq", "q49_anti_avg", "q55_top_supplier",
      // s18: s1's ≤5-row broadcast query set joined on =!= (the Hamming
      // shortlist and re-rank stay inside that one scan)
      // s19: s17's assignment/scale crossJoins; the filter is a keyed
      // LEFT SEMI join on the codes scan (the s12/s14 pattern)
      "t17_token_votes", "s15_int8_ann", "s16_hard_negatives",
      "s17_int8_persisted", "s18_binary_ann", "s19_filtered_int8",
      // s20: s7's assignment crossJoin (≤5-row query set × tiny
      // committed centroid table), rank filter widened to nprobe —
      // same intended shape, wider probe
      // e13: ONE-row (wmin, wmax) span aggregate broadcast-crossed
      // onto the tiny distinct-type list (the t6/c3 broadcast-scalar
      // pattern); the gap-fill join is a keyed equality join over the
      // grid, never event-sized
      // p5: s7's assignment crossJoin (≤5-row query set × tiny
      // committed centroid table) feeding the index-served pool; the
      // token join is keyed, the greedy bounded per query
      // s21: s1's ≤5-row broadcast query set joined on =!= (the quota
      // and re-rank windows are keyed shuffles over the scored frame)
      "s20_multiprobe_ivf", "e13_dense_grid", "p5_rag_served",
      "s21_quota_retrieval",
      // s22/s23: s17's assignment crossJoin (≤5-row query set × tiny
      // committed centroid table); the Hamming shortlist and re-rank
      // joins are keyed equality joins over zone-map-pruned files
      "s22_bin_persisted", "s23_filtered_bin",
      // q62-q65: the synthesized partsupp build broadcast-crosses the
      // ONE-row supplier-count aggregate onto the part scan (the
      // q49/q55 broadcast-scalar pattern); q63 additionally crosses
      // its ONE-row grand-total aggregate back for the share HAVING.
      // Every fact-sized join in the quartet is keyed or broadcast.
      "q62_mincost_supplier", "q63_important_stock",
      "q64_supplier_count", "q65_excess_stock")
  // d5 runs its tile loop eagerly at plan-construction; exclude it here
  // (its scale story is the tile partition-equivalence spec + d6).
  private val skipped = Set("d5_embed_neardup")

  test("no CartesianProduct anywhere; BNLJ only where intended") {
    val dir = sf("sf0.001")
    val offenders = scala.collection.mutable.ListBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skipped.contains(name)) {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          offenders += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name))
          offenders += s"$name: BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty, s"plan regressions: ${offenders.mkString("; ")}")
  }

  test("d12 Bloom-prunes the index postings below the shingle join") {
    val plan = Dedup.d12IncrementalDedup(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    // the batch's shingle sketch must pre-filter the index side map-side
    // BEFORE the equality join — the promise that makes the index scan
    // affordable when the batch is a sliver of the corpus
    assert(plan.contains("might_contain"),
      s"expected a might_contain pre-filter in d12's plan:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }

  test("d6 candidate join is a keyed equality join, never all-pairs") {
    val plan = Dedup.d6EmbedNearDupAnn(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan.take(2000))
  }
}
