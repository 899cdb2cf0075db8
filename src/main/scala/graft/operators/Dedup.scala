package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.MinhashSigAgg.minhashSig
import graft.functions.PolyHash.polyHashFast
import graft.functions.Shingles.shinglesDistinctFast
import graft.functions.TextFunctions._

/** Deduplication operators for large-scale training-data pipelines, over
  * the `documents` table. Five strategies, each with a DuckDB oracle that
  * replicates the arithmetic exactly:
  *
  *  - d1 exact:       hash-groupBy on md5(text)
  *  - d2 n-gram:      exact Jaccard over 3-token shingles via inverted-
  *                    index self-join (no O(n²) pair scan)
  *  - d3 minhash LSH: 32-permutation minhash, 8x4 banding, candidate
  *                    pairs from band-bucket join, signature-similarity
  *                    estimate
  *  - d4 simhash:     48-bit simhash over shingle hashes, 4x12-bit chunk
  *                    banding (pigeonhole-complete for hamming ≤ 3)
  *  - d5 embedding:   cosine near-dup over the embeddings table
  *
  * Scale design: every strategy avoids the all-pairs scan — candidates
  * come from equality joins on shingles / band keys / simhash chunks,
  * which shuffle-partition by key and scale linearly with corpus size.
  * The DuckDB oracles for d4 use the brute-force O(n²) definition, so a
  * hash-match also proves the banding is complete (pigeonhole), not just
  * deterministic.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Shingle stream: one row per distinct 3-shingle per doc. The native
    * expression dedups per document in O(k) (HashSet), so no distinct
    * shuffle is needed. */
  private def shingleRows(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), explode(shinglesDistinctFast(col("text"))).as("s"))

  // -- d1: exact dedup via hash-groupBy --------------------------------

  /** Exact dedup: group by content hash, keep the smallest doc_id as the
    * surviving representative. At 100 TB this is one shuffle on a 128-bit
    * hash — never on the full text. */
  def d1ExactDedup(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  // -- d2: exact n-gram Jaccard near-dup -------------------------------

  def d2NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // Each shingle row carries its doc's set size (computed row-locally),
    // so the Jaccard denominator travels with the posting list and no
    // per-doc count join is needed: the whole operator is two keyed
    // shuffles — groupBy(shingle) then groupBy(pair).
    // Pairs are generated inside each shingle's posting list (sorted by
    // doc id, i<j), replacing a shingle self-join. At 100 TB a frequency
    // cap on posting lists (drop stop-shingles) bounds the f²/2 fan-out;
    // not applied here to keep the exact-Jaccard semantics the oracle
    // checks.
    val sh = docs(s, dir)
      .select(col("doc_id"), shinglesDistinctFast(col("text")).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast("long").as("n"),
        explode(col("shs")).as("s"))
    val pairs = sh.groupBy("s")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.getField("doc_id").as("a"), x.getField("n").as("na"),
            y.getField("doc_id").as("b"), y.getField("n").as("nb")))))).as("p"))
    val jac = pairs
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("common"), first(col("p.na")).as("na"),
        first(col("p.nb")).as("nb"))
      .select(col("doc_a"), col("doc_b"),
        (col("common").cast("double") /
          (col("na") + col("nb") - col("common")).cast("double")).as("jac"))
    jac.filter(col("jac") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jac"))
      .orderBy("doc_a", "doc_b")
  }

  // -- d3: minhash + LSH banding ---------------------------------------

  /** Minhash signature per doc via the custom [[MinhashSigAgg]]
    * TypedImperativeAggregate: one shuffle (groupBy doc_id) with a
    * single 32-slot buffer instead of 32 separate min aggregates —
    * identical results to the per-permutation formulation the oracle
    * defines. */
  private def signatures(s: SparkSession, dir: String): DataFrame =
    shingleRows(s, dir)
      .select(col("doc_id"), polyHashFast(col("s"), P31).as("h"))
      .groupBy("doc_id")
      .agg(minhashSig(col("h")).as("sig"))

  def d3MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sig = signatures(s, dir)
    val bands = sig.select(col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(MinhashBands - 1))).as("band"))
      .withColumn("bk", slice(col("sig"), col("band") * MinhashRows + 1, lit(MinhashRows)))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (acc, v) => acc + v)
          / lit(MinhashK.toDouble)).as("est"))
      .filter(col("est") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("est"), 4).as("est_jac"))
      .orderBy("doc_a", "doc_b")
  }

  // -- d4: simhash with chunk banding ----------------------------------

  /** 48-bit simhash per doc from P57 shingle hashes: bit b is set when
    * sum over shingles of (2*bit_b(h) - 1) is positive. */
  private def simhashes(s: SparkSession, dir: String): DataFrame = {
    val hs = shingleRows(s, dir).select(col("doc_id"), polyHashFast(col("s"), P57).as("h"))
    val bitSums = hs.groupBy("doc_id").agg(
      sum(shiftright(col("h"), 0).bitwiseAND(lit(1L)) * 2 - 1).as("b0"),
      (1 until SimhashBits).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$b")): _*)
    bitSums.select(col("doc_id"),
      (0 until SimhashBits).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _).as("sim"))
  }

  def d4Simhash(s: SparkSession, dir: String): DataFrame = {
    val sim = simhashes(s, dir)
    // Any pair with hamming ≤ 3 shares at least one of the 4 12-bit
    // chunks (pigeonhole), so the chunk-equality join is complete.
    val chunks = sim.select(col("doc_id"), col("sim"),
      explode(sequence(lit(0), lit(SimhashChunks - 1))).as("c"))
      .withColumn("ck", expr(s"shiftrightunsigned(sim, c * $SimhashChunkBits)")
        .bitwiseAND(lit((1L << SimhashChunkBits) - 1)))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.c") === col("b.c") && col("a.ck") === col("b.ck") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  // -- d5: embedding cosine near-dup -----------------------------------

  /** All-pairs exact cosine via a broadcast block: one side of the pair
    * space is broadcast (ids + vectors + norms, ~0.5KB/vector) and each
    * partition of the other side runs a tight dot-product loop against it.
    * At 100 TB the broadcast side becomes a sequence of tiles (outer loop
    * over blocks), keeping the exact O(n²) semantics with linear-per-tile
    * memory; the oracle (and the semantics) are unchanged from the naive
    * pair join — the loop accumulates in the same left-fold order. */
  def d5EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Similarity.normalized(Tables.load(s, dir, "embeddings"))
      .select(col("vec_id"), col("v"), col("nrm"))
      .as[(Long, Array[Double], Double)]
    val block = e.collect().sortBy(_._1) // one tile at test scale
    val bc = s.sparkContext.broadcast(block)
    val thr = 0.4
    e.mapPartitions { it =>
      val all = bc.value
      it.flatMap { case (id, v, n) =>
        all.iterator.filter(_._1 > id).flatMap { case (jd, w, m) =>
          var acc = 0.0
          var k = 0
          while (k < v.length) { acc += v(k) * w(k); k += 1 }
          val cos = acc / (n * m)
          if (cos >= thr) Iterator.single((id, jd, cos)) else Iterator.empty
        }
      }
    }.toDF("vec_a", "vec_b", "cos_raw")
      .select(col("vec_a"), col("vec_b"), round(col("cos_raw"), 4).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  // -- wiring ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> d1ExactDedup _,
    "d2_ngram_jaccard" -> d2NgramJaccard _,
    "d3_minhash_lsh" -> d3MinhashLsh _,
    "d4_simhash" -> d4Simhash _,
    "d5_embed_neardup" -> d5EmbedNearDup _,
  )

  import OracleSql._

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      ("SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents " +
        "GROUP BY md5(text) ORDER BY doc_id"),
    "d2_ngram_jaccard" ->
      (s"""WITH $shingleCte,
         |cnt AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
         |cm AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) common
         |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  round(CAST(common AS DOUBLE)/CAST(ca.n+cb.n-common AS DOUBLE), 4) jac
         |FROM cm JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id
         |WHERE CAST(common AS DOUBLE)/CAST(ca.n+cb.n-common AS DOUBLE) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin),
    "d3_minhash_lsh" -> {
      val mins = (0 until MinhashK)
        .map(j => s"min((${permA(j)}*h + ${permB(j)}) % $P31)").mkString(", ")
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, ${polyHashSql("s", P31)} h FROM sh),
         |sig AS (SELECT doc_id, [$mins] sig FROM hs GROUP BY doc_id),
         |bands AS (SELECT doc_id, sig, band,
         |            sig[band*$MinhashRows+1 : band*$MinhashRows+$MinhashRows] bk
         |          FROM sig CROSS JOIN range(0, $MinhashBands) r(band)),
         |cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b,
         |            a.sig sig_a, b.sig sig_b
         |          FROM bands a JOIN bands b
         |            ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, round(est, 4) est_jac FROM (
         |  SELECT doc_a, doc_b,
         |    list_reduce(list_concat([CAST(0 AS BIGINT)],
         |      list_transform(range(1, ${MinhashK + 1}),
         |        i -> CASE WHEN sig_a[i] = sig_b[i] THEN CAST(1 AS BIGINT)
         |             ELSE CAST(0 AS BIGINT) END)),
         |      (acc, v) -> acc + v) / ${MinhashK.toDouble} est
         |  FROM cand) WHERE est >= 0.5 ORDER BY doc_a, doc_b""".stripMargin
    },
    "d4_simhash" -> {
      // Brute-force O(n²) oracle: also proves the banding join is complete.
      s"""WITH $shingleCte,
         |hs AS (SELECT doc_id, ${polyHashSql("s", P57)} h FROM sh),
         |bits AS (SELECT doc_id, b, sum(((h >> b) & 1)*2 - 1) v
         |         FROM hs CROSS JOIN range(0, $SimhashBits) r(b) GROUP BY doc_id, b),
         |sim AS (SELECT doc_id,
         |          sum(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) sim
         |        FROM bits GROUP BY doc_id)
         |SELECT a.doc_id doc_a, b.doc_id doc_b,
         |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "d5_embed_neardup" ->
      (s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) v
         |           FROM embeddings),
         |n AS (SELECT vec_id, v, ${normSql("v")} nrm FROM e)
         |SELECT vec_a, vec_b, round(cos, 4) cos FROM (
         |  SELECT a.vec_id vec_a, b.vec_id vec_b,
         |    ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) cos
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |WHERE cos >= 0.4 ORDER BY vec_a, vec_b""".stripMargin),
  )
}
