package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** A real byte-pair-encoding tokenizer, distributed: learn the merge
  * table from the corpus, then tokenize every document with it — the
  * step a training pipeline runs between curation and sequence packing
  * (t1's regex token count is the cheap proxy; this is the learned
  * vocabulary itself).
  *
  * Training follows the classic formulation (Sennrich et al. 2016,
  * arXiv:1508.07909): start from characters, repeatedly merge the most
  * frequent adjacent symbol pair. The key scale property: training
  * iterates over the DISTINCT-WORD frequency table, not the corpus —
  * the vocabulary is orders of magnitude smaller than 100 TB of text,
  * and each merge round is one flatMap + one keyed aggregation over it.
  * The per-round argmax is a single-row collect (the Lloyd-loop shape:
  * a driver loop over distributed rounds, state = one (pair, count)
  * row per round — not a driver-side data scan). Encoding reuses the
  * training state: the final symbol table IS each word's encoding, so
  * tokenizing the corpus is explode-words → broadcast-join the word →
  * token-count map → per-doc sum.
  *
  * Determinism: the argmax tie-breaks on (count desc, pair asc); merge
  * application is leftmost non-overlapping; both are fixed total orders,
  * so the merge table is a pure function of the corpus. No SQL oracle —
  * iterative argmax training is not SQL-expressible — the BpeSpec
  * instead proves the distributed trainer identical to a sequential
  * reference implementation on a planted corpus. */
object Bpe {

  /** One BPE merge step applied to a symbol sequence: replace every
    * leftmost non-overlapping (a, b) adjacency with the fused symbol. */
  private[operators] def applyMerge(syms: IndexedSeq[String],
      a: String, b: String): IndexedSeq[String] = {
    if (syms.length < 2) return syms
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Distinct-word frequency table with current symbol sequences. */
  private def wordTable(s: SparkSession, dir: String): Dataset[(String, Long)] = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)]
  }

  /** Driver-heap gate for the sequential fast path: the word-frequency
    * table, not the corpus — 2M distinct words × ~50 bytes ≈ 100 MB.
    * Real corpora sit far below it (vocabulary grows ~O(corpus^0.5),
    * Heaps' law); the distributed loop is the beyond-gate path. */
  private[operators] val DriverMaxVocab = 2000000L

  /** Learn `numMerges` merges; returns (ordered merge table, final word
    * → token-count encoding). Stops early when no pair repeats.
    * Size-gated like d7's union-find: a driver-resident vocabulary
    * trains sequentially (the per-round distributed argmax is
    * scheduling-bound — ~0.3s/round for µs of CPU); a huge vocabulary
    * takes the distributed loop. BpeSpec proves the two paths produce
    * the identical merge table and encodings. */
  private[operators] def train(s: SparkSession, dir: String, numMerges: Int)
      : (Seq[(String, String)], Map[String, Int]) = {
    import s.implicits._
    val wt = wordTable(s, dir)
    // one corpus scan in the common path: collect up to gate+1 rows —
    // if the limit was not hit, that IS the whole vocabulary
    val head = wt.limit((DriverMaxVocab + 1).toInt).collect()
    if (head.length <= DriverMaxVocab) trainSequential(head.toSeq, numMerges)
    else trainDistributed(s, wt, numMerges)
  }

  /** In-memory trainer over a collected word-frequency table — the
    * same algorithm, same tie-breaks. */
  private[operators] def trainSequential(freq: Seq[(String, Long)],
      numMerges: Int): (Seq[(String, String)], Map[String, Int]) = {
    var words: Map[String, (Long, IndexedSeq[String])] =
      freq.map { case (w, f) => w -> (f, w.map(_.toString).toIndexedSeq) }.toMap
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.values.foreach { case (f, syms) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        // tie-break must match the distributed path's orderBy on string
        // columns, which is UTF8String BINARY order (unsigned UTF-8
        // bytes) — Scala's String.compareTo is UTF-16 order and
        // disagrees above the BMP
        implicit val utf8Order: Ordering[String] = utf8ByteOrder
        val ((a, b), _) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        merges += ((a, b))
        words = words.map { case (w, (f, syms)) => w -> (f, applyMerge(syms, a, b)) }
      }
      round += 1
    }
    (merges.result(), words.map { case (w, (_, syms)) => w -> syms.length }.toMap)
  }

  /** Unsigned lexicographic order over UTF-8 bytes — identical to
    * Spark's UTF8String.compareTo, so both trainer paths break argmax
    * ties the same way for any input. */
  private[operators] val utf8ByteOrder: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    var r = 0
    while (r == 0 && i < n) { r = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
    if (r != 0) r else a.length - b.length
  }

  /** Distributed trainer — the beyond-driver-gate path. */
  private[operators] def trainDistributed(s: SparkSession,
      wt: Dataset[(String, Long)], numMerges: Int)
      : (Seq[(String, String)], Map[String, Int]) = {
    import s.implicits._
    // localCheckpoint (eager), not persist: persist caches blocks but the
    // LOGICAL PLAN still accretes one map-layer per round — by round ~30
    // rendering/optimizing the plan tree OOMs the driver. Checkpointing
    // truncates lineage to the materialized partitions each round.
    // vocabulary-sized table: a handful of partitions keeps each round's
    // jobs at a few tasks (round cost is scheduling-bound, not CPU-bound)
    var words: Dataset[(String, Long, IndexedSeq[String])] = wt
      .repartition(4)
      .map { case (w, f) => (w, f, w.map(_.toString).toIndexedSeq) }
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val top = words
        .flatMap { case (_, f, syms) =>
          syms.sliding(2).collect { case scala.collection.Seq(a, b) => (a, b, f) }
        }
        .toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        val prev = words
        words = prev.map { case (w, f, syms) => (w, f, applyMerge(syms, a, b)) }
          .localCheckpoint(true)
        prev.unpersist()
      }
      round += 1
    }
    val encoding = words.map { case (w, _, syms) => (w, syms.length) }
      .collect().toMap
    words.unpersist()
    (merges.result(), encoding)
  }

  /** Memoized trainer state per corpus fingerprint (the merge table is
    * corpus-level, like the dedup pair caches). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String, Int), (Seq[(String, String)], Map[String, Int])]()

  private[operators] def trained(s: SparkSession, dir: String,
      numMerges: Int = 24): (Seq[(String, String)], Map[String, Int]) =
    cache.computeIfAbsent((s, dir, Dedup.fingerprint(dir, "documents"), numMerges),
      _ => train(s, dir, numMerges))

  /** t11: per-document token counts under the LEARNED BPE vocabulary —
    * whitespace words, learned subword tokens, and the compression
    * ratio in basis points. The encode pass broadcasts the word →
    * token-count map (vocabulary-sized) against one corpus scan. */
  def t11BpeTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = trained(s, dir)._2
    val encB = s.sparkContext.broadcast(enc)
    val perDoc = Tables.load(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val words = ws.filter(_.nonEmpty)
        val chars = words.map(_.length.toLong).sum
        val toks = words.map(w => encB.value.getOrElse(w, w.length).toLong).sum
        (id, words.length.toLong, toks, chars)
      }
      .toDF("doc_id", "n_words", "n_bpe", "n_chars_tok")
    perDoc.select(col("doc_id"), col("n_words"), col("n_bpe"),
      when(col("n_chars_tok") === 0, 0L)
        .otherwise(round(col("n_bpe") * 10000.0 / col("n_chars_tok")).cast("long"))
        .as("compression_bp"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_bpe_tokens" -> t11BpeTokens _,
  )

  /** Iterative argmax training has no SQL twin; the driver records the
    * rows-only check and BpeSpec carries the equivalence proof. */
  val oracles: Map[String, String] = Map.empty
}
