package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text hashing/shingling primitives shared by the dedup and
  * text-analysis operators. Everything here is pure `functions._`
  * composition (codegen'd, no UDFs) and arithmetically reproducible in
  * ANSI SQL — the DuckDB oracles replicate these formulas exactly.
  *
  * Hashes are polynomial rolling hashes folded left with init 7 and
  * multiplier 31 modulo a prime — the classic string-fingerprint scheme
  * (cf. Karp–Rabin). Two moduli: P31 (fits minhash permutation products in
  * a long) and P57 (wide hashes for simhash bit sampling).
  */
object TextFunctions {

  /** 2^31-1, Mersenne prime. a*h+b stays < 2^63 for a,b,h < P31. */
  val P31 = 2147483647L

  /** Prime near 2^57: acc*31+c stays < 2^63 during the fold. */
  val P57 = 144115188075855859L

  /** Number of minhash permutations. */
  val MinhashK = 32

  /** LSH banding for minhash: 8 bands x 4 rows. */
  val MinhashBands = 8
  val MinhashRows = 4

  /** Simhash width in bits and its banding (4 chunks x 12 bits ⇒ any pair
    * with hamming distance ≤ 3 shares at least one chunk, by pigeonhole). */
  val SimhashBits = 48
  val SimhashChunks = 4
  val SimhashChunkBits = 12

  /** Minhash permutation constants a_j, b_j (j in 0..K-1), LCG-derived. */
  def permA(j: Int): Long = (1103515245L * (j + 1) + 12345L) % P31
  def permB(j: Int): Long = (1103515245L * (j + 100) + 54321L) % P31

  /** Array of character codes of `s` (1-based substr, ASCII payloads). */
  def charCodes(s: Column): Column =
    transform(sequence(lit(1), length(s)), i => ascii(substr(s, i, lit(1))).cast("long"))

  /** Polynomial rolling hash: fold (acc*31 + code) % p from init 7. */
  def polyHash(s: Column, p: Long): Column =
    aggregate(charCodes(s), lit(7L), (acc, c) => (acc * 31 + c) % p)

  /** Whitespace tokens (the synthetic corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-token shingles joined by a space; empty array when the
    * document has fewer than n tokens. */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(shinglesAll(text, n))

  /** All n-token shingles (with duplicates). Callers that explode should
    * prefer this + a distributed distinct over per-row array_distinct —
    * array_distinct is O(k²) string compares per document, which dominates
    * shingle pipelines on long documents. */
  def shinglesAll(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    when(count >= 1,
      transform(sequence(lit(1), count), i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }
}
