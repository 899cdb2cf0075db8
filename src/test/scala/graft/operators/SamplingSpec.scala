package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** c1 stratified sampling: the two-phase (salted) quota must be row-for-
  * row identical to the naive single-window formulation — the salting
  * changes shuffle geometry only — plus quota and determinism checks. */
class SamplingSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  test("two-phase salted quota == single-phase window (any salt count)") {
    val singlePhase = {
      val keyed = Tables.load(spark, dir, "documents").select(
        col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("sk"))
      keyed.withColumn("rn",
        row_number().over(Window.partitionBy("lang").orderBy(col("sk"), col("doc_id"))))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("doc_id"), col("rn").cast("long").as("rk"))
    }
    for (salts <- Seq(1, 7, 16)) {
      val twoPhase = Sampling.c1StratifiedSample(spark, dir, perStratum = 20, salts = salts)
      assert(twoPhase.exceptAll(singlePhase).isEmpty &&
        singlePhase.exceptAll(twoPhase).isEmpty,
        s"two-phase(salts=$salts) must equal the single-phase window")
    }
  }

  test("c6 next-fit packing: bins reset at capacity; oversized doc packs alone") {
    // planted shard (single shard: ids ≡ 0 mod 8): sizes 1000, 900
    // (closes bin 0 at 1900), 200 → overflow → bin 1; 5000 oversized →
    // bin 2 alone; 8 → bin 3 (5000 left no room)
    val dir2 = tmpDir("c6-spec")
    import spark.implicits._
    Seq(
      (0L, (1 to 1000).map(_ => "w").mkString(" ")),
      (8L, (1 to 900).map(_ => "w").mkString(" ")),
      (16L, (1 to 200).map(_ => "w").mkString(" ")),
      (24L, (1 to 5000).map(_ => "w").mkString(" ")),
      (32L, (1 to 8).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val out = Sampling.c6PackBins(spark, dir2).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out === Map(0L -> 0L, 8L -> 0L, 16L -> 1L, 24L -> 2L, 32L -> 3L))
  }

  test("c5 chunking: offsets contiguous per shard; ranges sane") {
    val out = Sampling.c5PackChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, tok, cf, cl) =>
      assert(tok >= 1 && cf <= cl, "chunk range must be non-empty and ordered")
    }
    // within a shard, the running chunk index never goes backwards and
    // the concatenated stream's final chunk equals ceil(sum tok / ctx) - 1
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, aLast), (_, _, _, bFirst, _)) =>
          // the next doc starts in the previous doc's last chunk or the
          // one right after it (exactly when the boundary was crossed)
          assert(bFirst == aLast || bFirst == aLast + 1)
        case _ => ()
      }
      val total = sorted.map(_._3).sum
      val lastChunk = sorted.last._5
      assert(lastChunk === (total - 1) / Sampling.PackCtx)
    }
  }

  test("t10: planted and crafted PII is redacted with exact counts") {
    import spark.implicits._
    val dir3 = tmpDir("t10-spec")
    Seq((7L, "reach me at a.b-c_d@sub.example.org or 192.168.0.1 tel 555-123-4567 end"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir3/documents.parquet")
    val r = TextAnalysis.t10PiiScrub(spark, dir3).collect().head
    // 1 crafted + 1 planted of each kind
    assert(r.getLong(1) === 2L && r.getLong(2) === 2L && r.getLong(3) === 2L)
    // and the scrubbed text of the crafted string contains no raw PII
    val scrub = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
      "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>")
    val s2 = Seq("x a.b-c_d@sub.example.org y 192.168.0.1 z 555-123-4567")
      .toDF("text").select(scrub).head().getString(0)
    assert(s2 === "x <EMAIL> y <IP> z <PHONE>")
  }

  test("c14 composition law: per-source counts = corpus minus eval minus c9's flags; weights renormalize") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val mix = Sampling.c14DecontaminatedMix(spark, dir).collect()
    val flagged = Sampling.c9BloomDecontaminate(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val cleanBySource = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") >= 5).collect()
      .filterNot(r => flagged.contains(r.getAs[Long]("doc_id")))
      .groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong).toMap
    assert(mix.nonEmpty)
    mix.foreach { r =>
      assert(r.getLong(1) === cleanBySource(r.getString(0)),
        s"source ${r.getString(0)} must count exactly the clean docs")
    }
    // weights renormalize over the clean corpus: they sum to ~1 and
    // targets never exceed the clean total
    assert(math.abs(mix.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    val total = cleanBySource.values.sum
    assert(mix.map(_.getLong(3)).sum <= total)
  }

  test("c15 per-eval-item contamination: verbatim copy reads 1.0, disjoint reads 0.0, partial exact") {
    import spark.implicits._
    val dirP = tmpDir("c15-planted")
    // eval ids < 5; train >= 5. Shingles are 3-grams, so overlap counts
    // are over per-doc DISTINCT trigrams.
    val memorized = (1 to 12).map(i => s"m$i").mkString(" ") // 10 trigrams
    val clean = (1 to 12).map(i => s"c$i").mkString(" ")
    // partial: first 6 tokens shared with a train doc → trigrams
    // m1..m4-starting 4 of its 10 are fully inside the shared prefix
    val half = ((1 to 6).map(i => s"h$i") ++ (1 to 6).map(i => s"u$i")).mkString(" ")
    Seq(
      0L -> memorized, 1L -> clean, 2L -> half,
      5L -> memorized,                                  // verbatim in training
      6L -> ((1 to 6).map(i => s"h$i") ++ (1 to 9).map(i => s"w$i")).mkString(" "))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dirP/documents.parquet")
    val rep = Sampling.c15ContaminationReport(spark, dirP)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rep(0L) === ((10L, 10L, 1.0)), s"verbatim copy must read 1.0: $rep")
    assert(rep(1L) === ((10L, 0L, 0.0)), s"clean item must read 0.0: $rep")
    // doc 2's trigrams: h1h2h3, h2h3h4, h3h4h5, h4h5h6 are inside the
    // shared 6-token prefix; h5h6u1, h6u1u2 and the u-trigrams are not
    assert(rep(2L) === ((10L, 4L, 0.4)), s"partial overlap must be exact: $rep")
  }

  test("c16 dataset card equals a sequential recomputation of every field") {
    val sdir = sf("sf0.001")
    val rows = Tables.load(spark, sdir, "documents")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_._2)
    val stop = Set("the", "a", "of", "and", "to")
    def toks(t: String): Array[String] = t.split(" ", -1)
    def md5Hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // global dedup: the smallest doc_id per md5 survives (d1's key)
    val keptIds = rows.groupBy(r => md5Hex(r._3))
      .values.map(_.minBy(_._2)._2).toSet
    def quality(t: String): Double = {
      val ts = toks(t); val n = ts.length
      math.min(1.0, n / 100.0) * (1.0 - ts.count(stop).toDouble / n)
    }
    def isEn(t: String): Boolean = {
      val ts = toks(t)
      def h(ws: Set[String]) = ts.count(ws)
      val (en, de, fr, es) = (h(Set("the", "a", "of")), h(Set("der", "die", "und")),
        h(Set("le", "la", "et")), h(Set("el", "los", "y")))
      en > 0 && en >= de && en >= fr && en >= es
    }
    def p50(xs: Seq[Long]): Double = { // quantile_cont(0.5), q36's rule
      val s = xs.sorted; val h = (s.length - 1) * 0.5
      val lo = s(h.toInt).toDouble
      val v = if (h == h.toInt) lo else lo + (h - h.toInt) * (s(h.toInt + 1) - lo)
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val nDocs = ds.length.toLong
      val nUnique = ds.count(d => keptIds(d._2)).toLong
      val lens = ds.map(d => toks(d._3).length.toLong).toSeq
      val nTok = lens.sum
      val nQ = ds.count(d => quality(d._3) >= 0.35).toLong
      val nEn = ds.count(d => isEn(d._3)).toLong
      Seq[Any](src, nDocs, nUnique, (nDocs - nUnique) * 10000L / nDocs,
        nTok, nTok * 100L / nDocs, p50(lens),
        nQ * 10000L / nDocs, nEn * 10000L / nDocs)
    }
    val got = Sampling.c16DatasetCard(spark, sdir).collect().map(_.toSeq).toSeq
    assert(got === want,
      "the distributed card must equal the sequential datasheet field-for-field")
  }

  test("c17 curriculum: band-decomposed rank equals the single global window; shards deal round-robin") {
    val got = Sampling.c17Curriculum(spark, dir).collect()
    // naive formulation: ONE global window (the oracle's shape)
    val naive = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        floor(TextAnalysis.qualityRaw(col("text")) * 1000000L)
          .cast("long").as("q_micro"))
      .withColumn("crank", row_number().over(
        Window.orderBy(col("q_micro").desc, col("doc_id"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.nonEmpty && got.length === naive.size)
    got.foreach { r =>
      assert(r.getLong(3) === naive(r.getLong(0)),
        s"doc ${r.getLong(0)}: band-decomposed rank must equal the global window")
      assert(r.getLong(4) === (r.getLong(3) - 1) % 8 &&
        r.getLong(5) === (r.getLong(3) - 1) / 8,
        "shards must deal round-robin in curriculum order")
    }
    // each shard's positions are contiguous 0..n-1 (same progression)
    got.groupBy(_.getLong(4)).foreach { case (sh, rows) =>
      assert(rows.map(_.getLong(5)).sorted.toSeq ===
        (0L until rows.length).toSeq, s"shard $sh positions not contiguous")
    }
  }

  test("c9 bloom decontamination ≡ c2 exact, and the sketch prefilter is in the plan") {
    val c2 = Sampling.c2Decontaminate(spark, dir)
    val c9 = Sampling.c9BloomDecontaminate(spark, dir)
    assert(c9.exceptAll(c2).isEmpty && c2.exceptAll(c9).isEmpty,
      "bloom-prefiltered result diverged from the exact join")
    // the mechanism is engaged: the corpus-side scan is filtered through
    // BloomFilterMightContain before the confirm join
    val plan = c9.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1500))
    // the eval-shingle subtree is materialized ONCE: the sketch action
    // populated the cache, so the confirm join's eval side must read the
    // in-memory relation, not re-scan + re-shuffle the documents table
    assert(plan.contains("InMemoryTableScan"),
      s"confirm join must reuse the cached eval shingles:\n${plan.take(1500)}")
  }

  test("c9's bloom sketch is memoized: a second construction replays zero eval-side jobs") {
    // isolated corpus copy → cold caches, so the first construction's
    // jobs validate the job-group harness and the second's absence
    // proves the memo (same PersistedLru discipline as the shingles)
    val iso = tmpDir("c9-memo")
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(s"$iso/documents.parquet")
    val sc = spark.sparkContext
    sc.setJobGroup("c9-memo-first", "first c9 construction", false)
    Sampling.c9BloomDecontaminate(spark, iso)
    sc.setJobGroup("c9-memo-second", "second c9 construction", false)
    Sampling.c9BloomDecontaminate(spark, iso)
    sc.clearJobGroup()
    // the status store is fed by the async listener bus — wait until the
    // FIRST group's jobs appear (proves the harness sees jobs at all)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (sc.statusTracker.getJobIdsForGroup("c9-memo-first").isEmpty &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(sc.statusTracker.getJobIdsForGroup("c9-memo-first").nonEmpty,
      "cold construction must run eval-side jobs (shingle cache + sketch)")
    assert(sc.statusTracker.getJobIdsForGroup("c9-memo-second").isEmpty,
      "warm construction must replay NO jobs: shingles and sketch both memoized")
  }

  test("quota: min(perStratum, stratum size) per stratum; deterministic") {
    val quota = 30
    val out = Sampling.c1StratifiedSample(spark, dir, perStratum = quota)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = Tables.load(spark, dir, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(got(lang) === math.min(quota.toLong, n), s"quota for $lang")
    }
    // deterministic: same rows on a re-run
    val again = Sampling.c1StratifiedSample(spark, dir, perStratum = quota)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("c13: deterministic multi-epoch repetitions - dense reps, real upsampling, copy-count law") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val a = Sampling.c13EpochMix(spark, dir).collect()
    val b = Sampling.c13EpochMix(spark, dir).collect()
    assert(a.nonEmpty)
    // no RNG anywhere: byte-identical across runs
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // per (source, doc): reps are dense 1..n, and n obeys the
    // fractional-epoch law exactly - floor(em/1e6) or one more
    a.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case ((_, doc), rows) =>
      val reps = rows.map(_.getLong(3)).sorted.toSeq
      assert(reps === (1L to reps.length).toSeq, s"doc $doc reps must be dense: $reps")
      val em = rows.head.getLong(2)
      val full = em / 1000000L
      assert(reps.length == full || reps.length == full + 1,
        s"doc $doc: ${reps.length} copies vs epochs_micro $em")
    }
    // the operator actually UPSAMPLES on this corpus: some source runs
    // more than one full epoch (the property c11's truncation cannot
    // express), and budgets differ across sources (alpha-smoothing bites)
    val ems = a.map(r => r.getString(0) -> r.getLong(2)).distinct.toMap
    assert(ems.values.max > 1000000L, s"expected a multi-epoch source: $ems")
    assert(ems.values.toSet.size > 1, s"alpha weights should differentiate sources: $ems")
  }

  test("c19: per-source gate keeps exactly ceil(n/4), rank-dominant, mix preserved") {
    val kept = Sampling.c19QualityGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // the full scored frame, through the SAME shared logit definition
    val scored = Tables.load(spark, dir, "documents").select(
      col("doc_id").cast("long").as("doc_id"), col("source"),
      TextAnalysis.qualityLogitMicro.as("q")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = scored.groupBy(_._2)
    // quota: EVERY source survives with exactly ceil(n/4) docs — the
    // mix-preservation property a global threshold destroys
    val keptBySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    bySource.foreach { case (src, rows) =>
      assert(keptBySource.getOrElse(src, 0) === (rows.length + 3) / 4,
        s"source $src: expected ceil(${rows.length}/4)")
    }
    // rank dominance: within a source, every kept doc precedes every
    // dropped doc in (quality desc, doc_id asc) order
    val keptIds = kept.map(_._1).toSet
    bySource.foreach { case (src, rows) =>
      val ordered = rows.sortBy(r => (-r._3, r._1)).map(_._1).toSeq
      val cut = keptBySource(src)
      assert(ordered.take(cut).forall(keptIds) &&
          !ordered.drop(cut).exists(keptIds),
        s"source $src: the gate must keep exactly the rank-top $cut")
    }
    // ranks are dense 1..cut per source
    kept.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq,
        s"source $src ranks must be dense")
    }
  }

  test("c19 approx gate ≡ exact rank gate, on the real corpus and on a hot-source one") {
    // The 100 TB path (VERDICT r16 #3): per-source approx-quantile
    // threshold broadcast back + survivor re-rank. The 0.70-vs-0.75
    // margin makes the pre-filter provably keep every true
    // top-quartile row, so the trimmed output must be IDENTICAL to
    // the exact gate — not merely close.
    val corpus = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text")
    def collected(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(collected(Sampling.qualityGateApprox(corpus)) ===
      collected(Sampling.qualityGateCore(corpus)),
      "approx must reproduce the exact gate on the real corpus")

    // a synthetically HOT source — one source carrying 50x the mass of
    // the others (the window-skew shape the approx path exists for) —
    // plus a tiny source (n=1: the rank rule keeps it; a global
    // threshold would starve it) and a tie-heavy source (the trim must
    // break threshold ties by doc_id exactly like the rank gate)
    val hot = corpus.filter(col("doc_id") % 2 === 0)
      .withColumn("source", lit("hot"))
    val tiny = corpus.orderBy("doc_id").limit(1)
      .withColumn("source", lit("tiny"))
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val ties = corpus.orderBy("doc_id").limit(10)
      .withColumn("source", lit("ties"))
      .withColumn("doc_id", col("doc_id") + 2000000L)
      .withColumn("text", lit("same text same score for every row"))
    val skewed = hot.unionByName(tiny).unionByName(ties)
    assert(collected(Sampling.qualityGateApprox(skewed)) ===
      collected(Sampling.qualityGateCore(skewed)),
      "approx must reproduce the exact gate under source skew and ties")

    // plan shape: the per-source threshold table comes back as a
    // BROADCAST (never a shuffled join), and nothing is quadratic
    val plan = Sampling.qualityGateApprox(corpus)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "the threshold join must broadcast the tiny per-source table")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
