package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg.misraGries

/** Continuous heavy-hitter monitoring — t14's Misra–Gries sketch run as
  * ONE stateful streaming aggregation whose state IS the bounded sketch
  * buffer: O(k) state forever, whatever the vocabulary of the stream.
  *
  * Every trigger re-emits (complete mode) the refreshed candidate set —
  * by the sketch's guarantee always a superset of every token above
  * n/k of the stream SO FAR — plus the exact stream length n. That pair
  * is the monitoring contract ("what could currently be hot, and how
  * much have we seen"); when an exact answer is needed, t14's batch
  * second pass re-counts the candidates over the archived stream.
  *
  * This is also the state-store proof for the aggregate itself: between
  * triggers the Misra–Gries buffer round-trips through serialize/
  * deserialize and new batches MERGE into restored state — the
  * mergeable-summary path, exercised by HeavyHittersStreamSpec across
  * micro-batches. */
object HeavyHittersStream {

  /** The streaming frame: global Misra–Gries candidates + exact count
    * over a streaming DataFrame with a `tok` string column. Run it with
    * `outputMode("complete")`. */
  def query(tokens: DataFrame, k: Int): DataFrame =
    tokens.agg(misraGries(col("tok"), k).as("cand"), count(lit(1)).as("n"))
}
