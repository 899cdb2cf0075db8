package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** t16 boilerplate stripping + s8 hybrid retrieval — semantics beyond
  * the oracle hash: planted-duplicate behavior, fusion arithmetic, and
  * rank-list discipline. */
class RetrievalSpec extends SparkSpec {

  test("t16: exact duplicates are 100% boilerplate to each other; unique text is 0") {
    import spark.implicits._
    val dir = tmpDir("t16-spec")
    val chrome = (1 to 16).map(i => s"nav$i").mkString(" ") // two full segments
    Seq(
      (1L, chrome + " " + (1 to 8).map(i => s"uniq1$i").mkString(" ")),
      (2L, chrome + " " + (1 to 8).map(i => s"uniq2$i").mkString(" ")),
      (3L, (1 to 24).map(i => s"solo$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.t16Boilerplate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 1/2 share the 2-segment chrome; their third segments are unique
    assert(out(1L) === ((3L, 2L, 6666L)), s"got ${out(1L)}")
    assert(out(2L) === ((3L, 2L, 6666L)))
    // doc 3 shares nothing
    assert(out(3L) === ((3L, 0L, 0L)))
  }

  test("t16: a document shorter than one segment is absent, like the oracle") {
    import spark.implicits._
    val dir = tmpDir("t16-short")
    Seq((1L, "only three tokens"), (2L, (1 to 8).map(_.toString).mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ids = TextAnalysis.t16Boilerplate(spark, dir).collect().map(_.getLong(0))
    assert(ids.toSeq === Seq(2L))
  }

  test("s8: fused score equals the RRF arithmetic of the emitted ranks; lists bounded") {
    val out = Similarity.s8HybridRetrieval(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    def rrf(r: Long): Long = if (r == 0L) 0L else math.floor(1e6 / (60 + r)).toLong
    out.foreach { row =>
      val (q, id, rl, rs, f) = (row.getLong(0), row.getLong(1),
        row.getLong(2), row.getLong(3), row.getLong(4))
      assert(f === rrf(rl) + rrf(rs), s"q=$q id=$id fusion arithmetic")
      assert(rl >= 0 && rl <= 50 && rs >= 0 && rs <= 50, "rank-list depth")
      assert(rl > 0 || rs > 0, "a fused row must appear in at least one list")
      assert(id !== q, "the query is never its own result")
    }
    // at most 10 per query, ordered by fused score then id within a query
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.length <= 10, s"q=$qid top-k")
      val scores = rows.map(r => (-r.getLong(4), r.getLong(1))).toSeq
      assert(scores === scores.sorted, s"q=$qid ordering")
    }
  }

  test("s8 is deterministic: two runs return identical fused lists") {
    val a = Similarity.s8HybridRetrieval(spark, sf("sf0.001")).collect().toSeq
    val b = Similarity.s8HybridRetrieval(spark, sf("sf0.001")).collect().toSeq
    assert(a === b)
  }

  test("s10: pre-filter property — every neighbor satisfies the predicate; semi join is keyed") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val df = Similarity.s10FilteredAnn(spark, dir)
    val got = df.collect()
    assert(got.nonEmpty)
    // exact recall within the filtered universe: every returned id is an
    // English document's vector — the defining property post-filtering
    // cannot guarantee
    val en = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") === "en")
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    got.foreach(r => assert(en.contains(r.getLong(1)),
      s"neighbor ${r.getLong(1)} is not in the filtered universe"))
    // per-query lists are dense top-k
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // the metadata pre-filter plans as a keyed LEFT SEMI equality join,
    // never an all-pairs scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a semi-join pre-filter:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"))
  }

  test("s11: results live in (probed list AND filter); cosines are exact; s10 bounds the recall") {
    import org.apache.spark.sql.functions.col
    val dir = sf("sf0.001")
    val got = Similarity.s11FilteredIvf(spark, dir).collect()
    assert(got.nonEmpty)
    val en = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("lang") === "en")
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))).toMap
    def nrm(v: Array[Double]) = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(4)).sorted.toSeq === (1L to rows.length).toSeq)
      rows.foreach { r =>
        val id = r.getLong(2)
        // candidate universe: the filter AND the candidate's own list
        assert(en.contains(id), s"query $qid: $id not in the filtered universe")
        assert(raw(id)._1 === r.getInt(1), s"query $qid: $id not in the probed list")
        // reported cosine equals the exact left-fold recomputation
        val (q, c) = (raw(qid)._2, raw(id)._2)
        val dot = q.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        val exact = BigDecimal(dot / (nrm(q) * nrm(c)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(3) - exact) < 1e-9)
      }
    }
    // recall bound: every s11 hit that the exact filtered scan also
    // ranks must score no higher than s10's rank-1 for that query
    val s10Top = Similarity.s10FilteredAnn(spark, dir).collect()
      .filter(_.getLong(3) == 1L).map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.filter(_.getLong(4) == 1L).foreach { r =>
      assert(r.getDouble(3) <= s10Top(r.getLong(0)) + 1e-9,
        "the index path cannot beat the exact filtered scan")
    }
  }

  test("s13 MMR: an exact duplicate of the top hit is deferred behind a diverse candidate") {
    // planted pool: d1 and d2 are the SAME vector (near-top relevance),
    // d3 slightly less relevant but diverse. Plain top-3 = (d1, d2, d3);
    // MMR must pick d1, then d3 (d2's redundancy penalty 3.0·1.0 beats
    // its relevance edge), then d2.
    val v1 = Seq(1.0, 0.1)
    val v3 = Seq(1.0, -1.0)
    def nrm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    val picks = Similarity.mmrGreedy(Array(
      (1L, 0.99, v1, nrm(v1)),
      (2L, 0.99, v1, nrm(v1)),
      (3L, 0.93, v3, nrm(v3))), 3)
    assert(picks.map(_._1) === Seq(1L, 3L, 2L),
      s"duplicate must drop behind the diverse pick: $picks")
    assert(picks.map(_._3) === Seq(1L, 2L, 3L))
    // ties (same score, same vector) break on the smaller id
    val tied = Similarity.mmrGreedy(Array(
      (9L, 0.5, v1, nrm(v1)), (4L, 0.5, v1, nrm(v1))), 2)
    assert(tied.map(_._1) === Seq(4L, 9L))
  }

  test("p4 RAG context: prefix packing under the token budget over the filtered MMR list") {
    import org.apache.spark.sql.functions.{col, size, split}
    val dir = sf("sf0.001")
    val got = Similarity.p4RagContext(spark, dir).collect()
    assert(got.nonEmpty)
    val en = graft.Tables.load(spark, dir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id").cast("long")).collect().map(_.getLong(0)).toSet
    val tokOf = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long"),
        size(split(col("text"), " ", -1)).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // packed picks are a PREFIX of the MMR list: ranks dense from 1
      assert(sorted.map(_.getLong(1)).toSeq === (1L to rows.length).toSeq,
        s"query $q packing must keep a rank prefix")
      // the filter scoped the pool; no self-match
      assert(sorted.forall(r => en.contains(r.getLong(2))))
      assert(sorted.forall(_.getLong(2) !== q))
      // token accounting: tok is the doc's whitespace count, cum is the
      // inclusive running sum, and the budget holds at every pick
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getLong(4) === tokOf(r.getLong(2)))
        cum += r.getLong(4)
        assert(r.getLong(5) === cum, "cum_tok must be the inclusive running sum")
      }
      assert(cum <= 300L, s"query $q context exceeds the budget: $cum")
    }
    // the budget must actually bind somewhere at this SF (otherwise the
    // entry degenerates to s13-with-a-filter and proves nothing new)
    assert(got.length < 5 * 10, "at least one context must be cut by the budget")
  }

  test("s13 MMR corpus invariants: k distinct picks per query, rank 1 is pure relevance") {
    val dir = sf("sf0.001")
    val got = Similarity.s13MmrDiversify(spark, dir).collect()
    val s1Top = Similarity.s1AnnBrute(spark, dir).collect()
      .filter(_.getLong(3) === 1L).map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length === 10, s"query $q must fill k slots from a 20-pool")
      assert(rows.map(_.getLong(1)).distinct.length === rows.length)
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to 10L).toSeq)
      val first = rows.minBy(_.getLong(3))
      assert(first.getLong(1) === s1Top(q),
        s"pick 1 is pure relevance — must equal s1's rank 1 for query $q")
      // cos column is the true relevance of each pick, descending is NOT
      // required (diversity reorders) but every pick's cos is ≤ pick 1's
      assert(rows.forall(_.getDouble(2) <= first.getDouble(2) + 1e-9))
    }
  }

  test("s15: int8 codes are bounded, reconstruction error ≤ scale/2, scores integer-exact") {
    val dir = sf("sf0.001")
    val emb = graft.Tables.load(spark, dir, "embeddings").collect()
      .map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
        r.getLong(r.fieldIndex("vec_id")) -> v
      }.toMap
    // sequential reference of the quantization chain
    val units = emb.view.mapValues { v =>
      val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
      v.map(_ / nrm)
    }.toMap
    val gmx = units.values.map(_.foldLeft(0.0)((a, x) => math.max(a, math.abs(x)))).max
    val scale = math.max(gmx, 1e-30) / 127.0
    val codes = units.view.mapValues(_.map(x => math.floor(x / scale + 0.5).toLong)).toMap
    codes.values.foreach { c =>
      assert(c.forall(q => q >= -127L && q <= 127L), "int8 range")
    }
    units.foreach { case (id, u) =>
      u.zip(codes(id)).foreach { case (x, q) =>
        assert(math.abs(x - q * scale) <= scale / 2 + 1e-12, s"vec $id reconstruction")
      }
    }
    // the entry's iscore must equal the sequential integer dot exactly
    val got = Similarity.s15Int8Ann(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (q, id, iscore) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expect = codes(q).zip(codes(id)).foldLeft(0L)((a, p) => a + p._1 * p._2)
      assert(iscore === expect, s"q=$q id=$id integer dot")
      assert(id !== q, "the query is never its own result")
    }
  }

  test("s15: quantized recall@10 vs the exact s1 top-10") {
    val dir = sf("sf0.001")
    val exact = Similarity.s1AnnBrute(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val quant = Similarity.s15Int8Ann(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(quant.keySet === exact.keySet)
    val recalls = exact.keys.toSeq.sorted.map { q =>
      val r = (exact(q) & quant(q)).size.toDouble / exact(q).size
      assert(r >= 0.7, s"query $q recall@10 $r — int8 at 64 dims should stay close to exact")
      r
    }
    // deterministic data + integer ranking → the mean recall is a constant
    assert(recalls.sum / recalls.size >= 0.8, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("s18: hamming is the sign-disagreement count; re-rank cosines exact; shortlist respected") {
    val dir = sf("sf0.001")
    val emb = graft.Tables.load(spark, dir, "embeddings").collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray).toMap
    def hammingOf(a: Long, b: Long): Long =
      emb(a).zip(emb(b)).count { case (x, y) => (x >= 0) != (y >= 0) }.toLong
    def cosOf(a: Long, b: Long): Double = {
      val (x, y) = (emb(a), emb(b))
      x.zip(y).foldLeft(0.0)((s, p) => s + p._1 * p._2) /
        (math.sqrt(x.foldLeft(0.0)((s, v) => s + v * v)) *
          math.sqrt(y.foldLeft(0.0)((s, v) => s + v * v)))
    }
    val got = Similarity.s18BinaryAnn(spark, dir).collect()
    assert(got.nonEmpty)
    // the shortlist contract: every result's hamming is within the
    // query's 20 smallest (ties by vec_id), recomputed sequentially
    val shortlists = emb.keys.filter(_ < 5).map { q =>
      q -> emb.keys.filter(_ != q).toSeq
        .map(id => (hammingOf(q, id), id)).sorted.take(20).map(_._2).toSet
    }.toMap
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length === 10, s"query $q top-k depth")
      rows.foreach { r =>
        val (id, h, cos) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        assert(h === hammingOf(q, id), s"q=$q id=$id hamming")
        assert(h >= 0 && h <= emb(q).length, "hamming bounds")
        assert(math.abs(cos - math.rint(cosOf(q, id) * 1e4) / 1e4) < 5e-5,
          s"q=$q id=$id exact re-rank cosine")
        assert(shortlists(q).contains(id), s"q=$q id=$id outside the hamming shortlist")
      }
      val byRank = rows.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"q=$q cosine non-increasing in rank")
    }
  }

  test("s21: hard per-source quota holds; result equals the sequential quota walk over s1's order") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val out = Similarity.s21QuotaRetrieval(spark, dir).collect()
    assert(out.nonEmpty)
    // the cap binds per (query, source)
    out.groupBy(r => (r.getLong(0), r.getString(2))).foreach { case (k, rows) =>
      assert(rows.length <= 2, s"quota exceeded for $k")
    }
    // ranks dense per query
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(4)).sorted.toSeq === (1L to rows.length).toSeq,
        s"query $q ranks not dense")
    }
    // ground truth: walk the full cosine order per query, admitting a
    // candidate only while its source has quota left
    val srcOf = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val e = Similarity.normalized(graft.Tables.load(spark, dir, "embeddings"))
      .collect().map(r =>
        (r.getLong(0), r.getSeq[Double](2).toArray, r.getDouble(3)))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val queries = e.filter(_._1 < 5)
    queries.foreach { case (qid, qv, qn) =>
      val ordered = e.filter(_._1 != qid)
        .map { case (id, v, n) => (id, dot(qv, v) / (qn * n)) }
        .sortBy { case (id, c) => (-c, id) }
      val perSrc = scala.collection.mutable.Map.empty[String, Int]
      val picks = Seq.newBuilder[Long]
      var taken = 0
      ordered.iterator.takeWhile(_ => taken < 10).foreach { case (id, _) =>
        val sname = srcOf(id)
        if (perSrc.getOrElse(sname, 0) < 2) {
          perSrc(sname) = perSrc.getOrElse(sname, 0) + 1
          picks += id; taken += 1
        }
      }
      val got = out.filter(_.getLong(0) == qid).sortBy(_.getLong(4))
        .map(_.getLong(1)).toSeq
      assert(got === picks.result(),
        s"query $qid: the distributed quota result must equal the sequential walk")
    }
  }

  test("s16: every negative's label differs from the query's; ranking is the exact cosine order") {
    val dir = sf("sf0.001")
    val labels = graft.Tables.load(spark, dir, "embeddings").collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) -> r.getInt(r.fieldIndex("label"))).toMap
    val got = Similarity.s16HardNegatives(spark, dir).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.length === 10, s"query $q top-k depth")
      rows.foreach { r =>
        assert(labels(r.getLong(1)) !== labels(q), s"q=$q id=${r.getLong(1)} label must differ")
      }
      val byRank = rows.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-9 },
        s"q=$q cosine non-increasing in rank")
    }
  }

  test("t18: the first doc is fully novel, an exact copy scores zero, a partial copy scores its new-gram fraction") {
    import spark.implicits._
    val dir = tmpDir("t18-spec")
    Seq(
      (1L, "a b c d e f"), // grams: abc bcd cde def
      (2L, "a b c d e f"), // exact copy: zero novel
      (3L, "a b c d x y z")) // shares abc,bcd; introduces cdx,dxy,xyz
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.t18NgramNovelty(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) === ((4L, 4L, 1000000L)), s"first doc fully novel: $out")
    assert(out(2L) === ((4L, 0L, 0L)), s"exact copy introduces nothing: $out")
    assert(out(3L) === ((5L, 3L, 600000L)), s"partial copy: 3 of 5 new: $out")
    // corpus invariant on real data: every distinct shingle is novel in
    // exactly one document, so the novel counts sum to the distinct
    // gram count — the property that makes the score a partition of
    // the corpus vocabulary, not a heuristic
    val real = TextAnalysis.t18NgramNovelty(spark, sf("sf0.001"))
    val sumNovel = real.agg(sum("n_novel")).head().getLong(0)
    import graft.functions.Shingles.shinglesDistinctFast
    val distinctGrams = Tables.load(spark, sf("sf0.001"), "documents")
      .select(explode(shinglesDistinctFast(col("text"))).as("sng"))
      .distinct().count()
    assert(sumNovel === distinctGrams,
      s"novel counts must partition the gram vocabulary: $sumNovel vs $distinctGrams")
  }
}
