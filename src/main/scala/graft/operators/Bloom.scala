package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The one Bloom sketch-and-probe transport shared by every
  * small-side-prefilters-big-side operator (c9's decontamination, d12's
  * incremental dedup index, p3's incremental refresh): sketch the SMALL
  * side's keys into a one-row byte literal (a bounded driver action,
  * KB–MB), then map-side filter the BIG side with `might_contain` —
  * codegen, no false negatives (the prune can only drop rows the
  * subsequent equality join would drop anyway). Capacity 2^20 expected
  * items; the xxhash64 domain on both sides keeps sketch and probe
  * consistent by construction. */
private[graft] object Bloom {

  /** One-row Bloom sketch bytes over `df`'s column `c` — `null` when
    * `df` is empty (callers skip the probe; their join is empty or
    * unfiltered anyway). */
  def sketchBytes(df: DataFrame, c: Column): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.Bridge
    df.select(Bridge.column(new BloomFilterAggregate(
        Bridge.expression(xxhash64(c)), 1L << 20)
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
