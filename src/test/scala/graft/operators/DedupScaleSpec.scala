package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Scale-hygiene proofs for the dedup operators:
  *  - d5's tiled block-nested-loop partitions the pair space exactly:
  *    many small broadcast tiles produce the identical result set as a
  *    single tile covering the whole corpus.
  *  - d2's posting-list frequency cap drops hot-shingle fan-out without
  *    touching pairs whose overlap lives in cold shingles.
  */
class DedupScaleSpec extends SparkSpec {

  test("d5 tiled (many tiles) == d5 single tile, bit-identical") {
    val dir = sf("sf0.001")
    val multi = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64).collect()
    val single = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = Long.MaxValue).collect()
    assert(multi.length == single.length)
    assert(multi.sameElements(single))
    assert(multi.nonEmpty) // the corpus has planted near-dups; empty would vacuously pass
  }

  test("d5 is memoized: re-construction replays no tile jobs") {
    val dir = sf("sf0.001")
    val a = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64)
    val b = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64)
    assert(a eq b, "same (session, dir, tileRows, fingerprint) must return the cached plan")
  }

  test("d6 band layout derives from (threshold, target recall)") {
    // low threshold near the noise floor: cheap few-bit bands, many of them
    val (b04, r04) = Dedup.d6BandLayout(0.4, 0.95)
    assert(b04 * r04 <= Dedup.D6MaxPlanes)
    // the S-curve promise holds analytically for the derived layout
    def recallOf(thr: Double, bands: Int, bits: Int): Double = {
      val p = 1.0 - math.acos(thr) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, bits), bands)
    }
    assert(recallOf(0.4, b04, r04) >= 0.95)
    // high threshold: more bits per band (fewer noise candidates)
    val (b09, r09) = Dedup.d6BandLayout(0.9, 0.95)
    assert(recallOf(0.9, b09, r09) >= 0.95)
    assert(r09 > r04, "a high-threshold corpus should get longer band keys")
    assert(b09 * r09 <= Dedup.D6MaxPlanes)
    intercept[IllegalArgumentException] { Dedup.d6BandLayout(0.0, 0.95) }
    intercept[IllegalArgumentException] { Dedup.d6BandLayout(0.5, 1.0) }
  }

  test("d6 ANN prefilter: precision 1 vs exact d5; derived-layout recall at 0.4") {
    val dir = sf("sf0.001")
    val exact = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ann = Dedup.d6EmbedNearDupAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty)
    // exact-cosine re-check with identical fold order + rounding ⇒ every
    // ANN pair is a true pair with the identical score
    assert(ann.subsetOf(exact), s"ANN must be a subset: ${(ann -- exact).take(3)}")
    // the derived layout budgets ≥0.95 expected recall AT the 0.4
    // threshold. Pairs sitting exactly at the boundary realize slightly
    // less; the floor is ~3σ under the analytical promise for the ~66
    // planted pairs (σ ≈ 0.03 across corpus reseeds).
    val recall = ann.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall below the derived-layout floor")
  }

  test("d6 at a ≥0.9-threshold planted corpus: recall ≥ 0.95 vs exact") {
    // plant near-dup pairs at cos ≈ 0.93..0.97 among random noise: the
    // realistic near-dup regime the derived high-threshold layout serves
    val rng = new scala.util.Random(42)
    val dim = 64
    def gauss(): Array[Double] = Array.fill(dim)(rng.nextGaussian())
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = (0 until 150).map(i => i.toLong -> normalize(gauss()))
    // for 40 of them, plant a partner at an exact planned angle
    val planted = (0 until 40).map { i =>
      val (id, u) = base(i)
      val target = 0.93 + 0.001 * i
      val g = normalize(gauss())
      val dotGU = g.zip(u).map { case (a, b) => a * b }.sum
      val perp = normalize(g.zip(u).map { case (a, b) => a - dotGU * b })
      val v = u.zip(perp).map { case (a, b) =>
        a * target + b * math.sqrt(1 - target * target) }
      (1000L + id) -> v
    }
    val dir = tmpDir("d6-planted")
    import spark.implicits._
    (base ++ planted)
      .map { case (id, v) => (id, v.map(_.toFloat), 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val exact09 = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64).collect()
      .filter(_.getDouble(2) >= 0.9)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact09.size >= 40, s"expected the planted pairs, got ${exact09.size}")
    val ann = Dedup.d6EmbedNearDupAnn(spark, dir, threshold = 0.9, targetRecall = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.subsetOf(
      Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet))
    val recall = ann.count(exact09.contains).toDouble / exact09.size
    assert(recall >= 0.95, s"high-threshold recall $recall below target")
  }

  test("d14 reports one MAXIMAL mid-document span with exact offsets and length") {
    val shared = (1 to 20).map(i => s"x$i")
    val a = ((1 to 10).map(i => s"a$i") ++ shared ++ (1 to 10).map(i => s"b$i"))
      .mkString(" ")
    val b = ((1 to 5).map(i => s"c$i") ++ shared ++ (1 to 8).map(i => s"d$i"))
      .mkString(" ")
    val dir = writeDocs(Seq(1L -> a, 2L -> b,
      3L -> (1 to 30).map(i => s"z$i").mkString(" ")))
    val out = Dedup.d14SpanDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ONE maximal span — not the 11 constituent k-gram matches, not
    // sub-spans — at the exact token offsets of the shared run
    assert(out.toSeq === Seq((1L, 2L, 10L, 5L, 20L)))
  }

  test("d14 threshold binds: a 14-token shared run is silent, 15 reports") {
    def mk(n: Int) = {
      val shared = (1 to n).map(i => s"s$i")
      writeDocs(Seq(
        1L -> ((1 to 10).map(i => s"p$i") ++ shared).mkString(" "),
        2L -> (shared ++ (1 to 10).map(i => s"q$i")).mkString(" ")))
    }
    assert(Dedup.d14SpanDedup(spark, mk(14)).collect().isEmpty,
      "a shared run below SpanMinTokens must not report")
    val hit = Dedup.d14SpanDedup(spark, mk(15)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(hit.toSeq === Seq((1L, 2L, 10L, 0L, 15L)))
  }

  test("d14 gram-frequency cap drops hot-gram fan-out; spans in cold grams survive") {
    val shared = (1 to 20).map(i => s"x$i")
    val hot = (1 to 18).map(i => s"h$i") // a boilerplate run in MANY docs
    val docs = Seq(
      1L -> ((1 to 10).map(i => s"a$i") ++ shared).mkString(" "),
      2L -> ((1 to 10).map(i => s"b$i") ++ shared).mkString(" ")) ++
      (10L to 16L).map(i => i -> (hot ++ Seq(s"u$i", s"v$i", s"w$i")).mkString(" "))
    val dir = writeDocs(docs)
    val capped = Dedup.d14SpanDedup(spark, dir, maxGramFreq = Some(4L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // the 7-doc boilerplate grams exceed the cap and generate NO pairs;
    // the 2-doc shared span (posting lists of size 2) is untouched
    assert(capped.toSeq === Seq((1L, 2L, 20L)))
    // no-silent-caps: the engaged cap SURFACES its dropped-gram count
    // (logWarning + counter), so the capped report cannot read as
    // exhaustive
    assert(Dedup.spanCapDroppedLastRun > 0,
      "an engaged gram cap must surface its dropped-gram count")
    val uncapped = Dedup.d14SpanDedup(spark, dir).collect()
    assert(uncapped.length > 1, "uncapped must also report the boilerplate pairs")
    // an un-engaged cap reports zero dropped
    Dedup.d14SpanDedup(spark, dir, maxGramFreq = Some(1000L)).collect()
    assert(Dedup.spanCapDroppedLastRun === 0L,
      "a cap that drops nothing must report zero")
  }

  test("d16 scale shape: keyed banded join, Bloom-prefiltered corpus side, no nested-loop plan; matches are genuine") {
    val got = Dedup.d16IncrementalEmbed(spark, sf("sf0.001"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(2000))
    assert(plan.contains("might_contain"),
      "the Bloom prefilter must land map-side on the corpus band stream")
    val rows = got.collect()
    // every reported match is a batch vector citing a corpus vector at
    // cos >= the threshold (min-match contract sanity)
    assert(rows.forall(r => r.getLong(0) % 10 == 7 &&
      r.getLong(1) % 10 != 7 && r.getDouble(2) >= Dedup.D6Threshold))
  }

  test("d15 reports batch-vs-corpus spans only, through the sketch prefilter") {
    val shared = (1 to 20).map(i => s"x$i")
    val corpusDup = (1 to 18).map(i => s"y$i").mkString(" ")
    val dir = writeDocs(Seq(
      // corpus docs (id % 10 != 7): one shares a span with the batch,
      // two share a span with EACH OTHER only
      1L -> ((1 to 10).map(i => s"a$i") ++ shared).mkString(" "),
      2L -> corpusDup, 3L -> corpusDup,
      // batch doc (id % 10 == 7)
      17L -> (shared ++ (1 to 8).map(i => s"b$i")).mkString(" ")))
    val out = Dedup.d15IncrementalSpans(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // ONLY the corpus↔batch span; the corpus↔corpus duplicate (2,3)
    // must NOT appear — the incremental contract
    assert(out.toSeq === Seq((1L, 17L, 10L, 0L, 20L)))
    // the sketch prefilter is in the executed plan (d12's pin)
    val plan = Dedup.d15IncrementalSpans(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected the batch-sketch might_contain prune of the corpus " +
        s"gram stream:\n${plan.take(1500)}")
  }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = tmpDir("graft-capspec")
    import spark.implicits._
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("d7 clusters transitive near-dup chains under one representative") {
    val w = (1 to 40).map(i => s"w$i")
    // chain: t1≈t2 (last word differs, jac .854) and t2≈t3 (first word
    // differs, .854) but t1 vs t3 is .727 < .8 — only transitivity can
    // put all three in one cluster
    val t1 = w.mkString(" ")
    val t2 = (w.dropRight(1) :+ "zzz").mkString(" ")
    val t3 = ("aaa" +: w.drop(1).dropRight(1) :+ "zzz").mkString(" ")
    val dup = "quick brown foxes jump over lazy dogs tonight"
    val corpus = Seq(10L -> t1, 11L -> t2, 12L -> t3,
      20L -> dup, 21L -> dup,
      30L -> "completely unrelated content with no shared shingles at all")
    val dir = writeDocs(corpus)
    val out = Dedup.d7DedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq(
      (10L, 10L, 1), (11L, 10L, 0), (12L, 10L, 0), // chain collapsed transitively
      (20L, 20L, 1), (21L, 20L, 0)))               // isolated pair; 30 has no pairs
  }

  test("d7: driver union-find equals the distributed propagation loop") {
    val dir = sf("sf0.01")
    val pairs = Dedup.d2NgramJaccard(spark, dir).select("doc_a", "doc_b")
    val uf = Dedup.d7UnionFind(spark, pairs)
    val entry = Dedup.d7Propagate(spark, pairs, "spec")
    try {
      assert(uf.exceptAll(entry.df).isEmpty && entry.df.exceptAll(uf).isEmpty,
        "both component paths must produce the identical min-label clustering")
    } finally entry.labels.foreach(_.unpersist()) // spec owns this entry's cache
  }

  test("d11 (k-means blocking) is a subset of exact d5 with identical scores") {
    val dir = sf("sf0.001")
    val exact = Dedup.d5EmbedNearDupTiled(spark, dir, tileRows = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val d11 = Dedup.d11SemanticDedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    assert(d11.nonEmpty, "blocking should still find same-cluster near-dups")
    d11.foreach { case (pair, cos) =>
      assert(exact.get(pair).contains(cos),
        s"$pair must appear in exact d5 with the identical rounded cosine")
    }
  }

  test("simhash expression == explode + 48-sum aggregate formulation") {
    import org.apache.spark.sql.functions._
    import graft.functions.PolyHash.polyHashFast
    import graft.functions.TextFunctions
    import graft.functions.Shingles.shinglesDistinctFast
    import graft.functions.SimhashText.simhashFast
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    // the pre-round-5 aggregate formulation, verbatim — the oracle's
    // definition — against which the one-pass expression must be exact
    val hs = docs
      .select(col("doc_id"), explode(shinglesDistinctFast(col("text"))).as("s"))
      .select(col("doc_id"), polyHashFast(col("s"), TextFunctions.P57).as("h"))
    val bitSums = hs.groupBy("doc_id").agg(
      sum(shiftright(col("h"), 0).bitwiseAND(lit(1L)) * 2 - 1).as("b0"),
      (1 until TextFunctions.SimhashBits).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$b")): _*)
    val agg = bitSums.select(col("doc_id"),
      (0 until TextFunctions.SimhashBits).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = docs
      .select(col("doc_id"), simhashFast(col("text"), 3, TextFunctions.P57, TextFunctions.SimhashBits).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.nonEmpty && fast == agg)
    // a doc shorter than one shingle has NO signature (the aggregate
    // formulation never emits a row for it) — and two such docs must
    // NOT pair up as hamming-0 "near-dups" in d4
    import spark.implicits._
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(simhashFast(col("text"), 3, TextFunctions.P57, TextFunctions.SimhashBits)).head()
    assert(tiny.isNullAt(0))
    val dirShort = writeDocs(Seq(
      1L -> "a b", 2L -> "c d", // shingle-less: must not pair
      10L -> (1 to 40).map(_ => "w").mkString(" "),
      11L -> (1 to 40).map(_ => "w").mkString(" ")))
    val pairs = Dedup.d4Simhash(spark, dirShort).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((10L, 11L)),
      "only the real near-dups pair; shingle-less docs never band")
  }

  test("d9: exact dup scores lev=0; pairs are a re-scored subset of d4") {
    val w = (1 to 40).map(i => s"w$i")
    val dir = writeDocs(Seq(
      1L -> w.mkString(" "),
      2L -> w.mkString(" "),                              // exact dup: lev 0
      3L -> (w.dropRight(1) :+ "zzzzzz").mkString(" "),   // near dup: small lev
      4L -> "entirely different content that shares nothing at all here"))
    val out = Dedup.d9EditDistance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) === ((0L, 0.0)),
      "exact duplicate pair must score lev=0, ratio=0")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "the unrelated document pairs with nothing")
    val d4pairs = Dedup.d4Simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.keySet.subsetOf(d4pairs), "d9 re-scores d4's candidates only")
    out.foreach { case (_, (lev, ratio)) =>
      assert(ratio <= 0.2 && lev >= 0, "emitted pairs satisfy the ratio bound")
    }
  }

  test("d10: finds an excerpt Jaccard misses; symmetric dup scores both ways") {
    val quote = (1 to 20).map(i => s"q$i").mkString(" ")
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val dir = writeDocs(Seq(
      1L -> quote,                      // the short original
      2L -> s"$filler $quote",          // quotes doc 1 verbatim inside
      3L -> "unrelated words that never overlap with anything else at all"))
    val d10 = Dedup.d10Containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every shingle of doc 1 appears in doc 2 => containment 1.0
    assert(d10.get((1L, 2L)).contains(1.0), s"excerpt not found: $d10")
    assert(!d10.contains((2L, 1L)), "the long doc is NOT contained in the short one")
    // Jaccard misses it: union is dominated by the long side
    val d2 = Dedup.d2NgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!d2.contains((1L, 2L)), "symmetric Jaccard at 0.8 misses the excerpt")
  }

  test("d7 on a corpus without near-dups returns an empty cluster set") {
    val dir = writeDocs(Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six seven",
      3L -> "entirely different words in this document"))
    val out = Dedup.d7DedupClusters(spark, dir)
    assert(out.collect().isEmpty)
    assert(out.schema.fieldNames.toSeq === Seq("doc_id", "cluster_id", "keep"))
  }

  test("d2 frequency cap: cold-shingle near-dups survive, hot fan-out is dropped") {
    // Docs 1/2: identical text, all shingles cold (freq 2) -> jac 1.0.
    // Docs 100..299: every one contains the hot phrase "the quick brown fox"
    // (so its shingles have freq 200, far over any reasonable cap) plus a
    // unique tail, so no pair among them reaches 0.8.
    val nearDup = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(1L -> nearDup, 2L -> nearDup) ++
      (100L until 300L).map(i => i -> s"the quick brown fox u$i v$i w$i x$i y$i z$i")
    val dir = writeDocs(corpus)

    val uncapped = Dedup.ngramJaccardPairs(spark, dir).collect()
    val capped = Dedup.ngramJaccardPairs(spark, dir, Some(Dedup.D2MaxShingleFreq)).collect()
    assert(uncapped.toSet == capped.toSet)
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))

    // cap = 1 prunes every posting list (freq >= 2 wherever a pair exists),
    // proving the cap actually gates pair generation.
    assert(Dedup.ngramJaccardPairs(spark, dir, Some(1L)).collect().isEmpty)
  }

  test("d7 propagation: adversarial 1000-chain converges in O(log) rounds, not O(n)") {
    import spark.implicits._
    // a single path 0-1-2-...-999: the worst diameter per edge count —
    // plain neighbor propagation needs ~1000 join rounds; the
    // pointer-doubling shortcut must collapse that to ~log2(1000)
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val entry = Dedup.d7Propagate(spark, chain, "spec-chain")
    try {
      assert(entry.rounds <= 20,
        s"1000-chain took ${entry.rounds} propagation rounds — shortcut not engaging")
      val rows = entry.df.collect()
      assert(rows.length === 1000)
      assert(rows.forall(_.getLong(1) === 0L), "one component labeled by its min")
      assert(rows.count(_.getInt(2) === 1) === 1)
    } finally entry.labels.foreach(_.unpersist())
  }

  test("d7 propagate plans survive cache-replacement unpersist (labels file-backed, not checkpoint-bound)") {
    import spark.implicits._
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val entry = Dedup.d7Propagate(spark, chain, "spec-replace")
    val before = entry.df.collect().map(_.toSeq).toSeq
    // what d7Cache does when a regenerated corpus replaces the entry —
    // with checkpoint-backed labels this destroyed the only copy and
    // every previously returned plan failed with 'checkpoint block not
    // found'; file-backed labels must recompute instead
    entry.labels.foreach(_.unpersist(true))
    val after = entry.df.collect().map(_.toSeq).toSeq
    assert(after === before, "plan must recompute after replacement unpersist")
  }

  test("fingerprint resolves through the Hadoop FS: a rewritten remote corpus misses the cache") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.mock.impl", classOf[graft.storage.MockFs].getName)
    val dir = "mock:" + tmpDir("graft-remote-fp")
    def write(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    val dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    write(Seq(1L -> dup, 2L -> dup, 3L -> "unrelated words entirely different"))
    // the old java.nio walk returned "absent" for any non-local URI, so
    // every generation of a remote corpus shared one cache key
    val fp1 = Dedup.fingerprint(dir, "documents")
    assert(fp1 !== "absent", "remote corpus must fingerprint its real files")
    assert(Dedup.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    // regenerate the corpus in place: new fingerprint, fresh results —
    // not the previous generation's cached pairs
    write(Seq(1L -> dup, 2L -> "now unique too", 4L -> dup, 5L -> dup))
    assert(Dedup.fingerprint(dir, "documents") !== fp1)
    assert(Dedup.ngramJaccardPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 4L), (1L, 5L), (4L, 5L)))
    assert(Dedup.fingerprint(dir, "nonexistent") === "absent")
  }

  test("d2b oracle-equivalence precondition: corpus max shingle freq below cap") {
    // d2b's oracle assumes d2b == d2 on the test corpus; this pins the
    // precondition so a regenerated corpus that violates it fails loudly
    // here instead of as a silent driver hash mismatch.
    import org.apache.spark.sql.functions._
    import graft.functions.Shingles.shinglesDistinctFast
    val maxFreq = graft.Tables.load(spark, sf("sf0.01"), "documents")
      .select(col("doc_id"), explode(shinglesDistinctFast(col("text"))).as("s"))
      .groupBy("s").count().agg(max("count")).head().getLong(0)
    assert(maxFreq <= Dedup.D2MaxShingleFreq)
  }
}
