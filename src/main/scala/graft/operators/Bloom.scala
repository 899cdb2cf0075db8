package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The one Bloom sketch-and-probe transport shared by every
  * small-side-prefilters-big-side operator (c9's decontamination, d12's
  * incremental dedup index, p3's incremental refresh): sketch the SMALL
  * side's keys into a one-row byte literal (a bounded driver action,
  * KB–MB), then map-side filter the BIG side with `might_contain` —
  * codegen, no false negatives (the prune can only drop rows the
  * subsequent equality join would drop anyway). The sketch is SIZED
  * from a cheap count of the small side (one column-pruned count job —
  * the side is bounded by the caller's contract, so the extra pass is
  * small-side cost, not corpus cost); the xxhash64 domain on both
  * sides keeps sketch and probe consistent by construction. */
private[graft] object Bloom extends org.apache.spark.internal.Logging {

  /** Above this key count even the engine's largest sketch (Spark caps
    * `numBits` at 67,108,864 = 8 MiB) falls under 8 bits/key and the
    * false-positive rate degrades past ~2% — the probe stays CORRECT
    * (no false negatives, the exact join still runs over survivors)
    * but the "surviving store side ∝ batch size" cost claim weakens,
    * so the sketch logs a warning instead of silently thinning. */
  private val FppDegradeItems: Long = (1L << 26) / 8

  /** One-row Bloom sketch bytes over `df`'s column `c` — `null` when
    * `df` is empty (callers skip the probe; their join is empty or
    * unfiltered anyway). */
  def sketchBytes(df: DataFrame, c: Column): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    val n = df.count()
    if (n == 0L) return null
    if (n > FppDegradeItems) {
      logWarning(s"Bloom sketch over $n keys exceeds the 8-bits/key " +
        s"capacity of Spark's largest sketch ($FppDegradeItems); the " +
        "might_contain prefilter stays sound but will pass more false " +
        "positives to the exact join")
    }
    // BloomFilterAggregate itself clamps items/bits to the session's
    // runtime-filter maxima, so the oversized case degrades gracefully.
    df.select(Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(c)), math.max(n, 1024L))
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** The matching map-side probe: `might_contain(sketch, xxhash64(c))`
    * as a codegen Column. */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.BinaryType
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      Bridge.expression(xxhash64(c))))
  }
}
