package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis
import graft.storage.GraftTable

/** Streaming quality scoring with the DISTILLED token-vote model —
  * t17's serving half run continuously: the model is TRAINED ONCE from
  * a static teacher corpus (t15's logit labels through t17's own
  * training body), then every incoming micro-batch of documents is
  * scored by integer vote sums and the (doc_id, n_voters, score,
  * keep_pred) decisions land in a graft table exactly-once. The point
  * of distillation made operational: intake batches are filtered
  * WITHOUT re-running the teacher's wide feature pass.
  *
  * Stream-static discipline (the [[DedupStream]] argument): a
  * document's score depends only on ITS OWN tokens and the static vote
  * table, so per-batch scoring is exact with zero streaming state. The
  * vote table is built once at `start` and persisted (vocab-sized —
  * document frequency ≥ 5 bounds it); each batch joins it through
  * `TextAnalysis.tokenVoteScore`, the SAME body the batch entry runs,
  * so stream ≡ batch on every prefix by construction. */
object TokenVoteStream {

  /** The once-trained model: persisted (tok, vote) table. */
  final class VoteModel private[streaming] (
      private[streaming] val votes: DataFrame) {
    def release(): Unit = { votes.unpersist(); () }
  }

  /** One teacher pass over (doc_id, text) docs: label with t15's logit,
    * train t17's polarity votes, persist and materialize the result so
    * no micro-batch re-executes the teacher subtree. */
  def buildModel(teacherDocs: DataFrame): VoteModel = {
    val votes = TextAnalysis.tokenVoteModel(
      TextAnalysis.teacherLabeled(teacherDocs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    votes.count() // force: train exactly once, before the stream starts
    new VoteModel(votes)
  }

  /** Score one (micro-)batch of (doc_id, text) documents — t17's apply
    * body over the persisted votes. */
  def score(model: VoteModel, batch: DataFrame): DataFrame =
    TextAnalysis.tokenVoteScore(model.votes, TextAnalysis.tokDocs(batch))

  /** Start scoring `incoming` (streaming doc_id/text) with a model
    * trained once from `teacherDocs`; decisions append to `dest`
    * exactly-once under the checkpoint's txn id. The model is released
    * when the stream terminates. */
  def start(incoming: DataFrame, teacherDocs: DataFrame, dest: GraftTable,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val model = buildModel(teacherDocs)
    val q = start(incoming, model, dest, checkpoint, trigger)
    GraftStreamIngest.releaseOnTerminate(q)(() => model.release())
    q
  }

  /** Same, against a caller-prebuilt (shared, reusable) model. */
  def start(incoming: DataFrame, model: VoteModel, dest: GraftTable,
      checkpoint: String, trigger: Trigger): StreamingQuery = {
    val id = GraftStreamIngest.txnId(checkpoint)
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dest.appendStream(score(model, batch), id, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }
}
