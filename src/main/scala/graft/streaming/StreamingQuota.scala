package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous per-source token-quota enforcement — the streaming face
  * of [[graft.pipeline.Sampling.q99QuotaGate]]: each source carries a
  * fixed token allocation (e.g. the q98 water-filling output), and
  * arriving documents admit while their source's running total still
  * fits. This is how a continuously-fed training mix holds its
  * composition: the batch planner decides the allocations once, the
  * stream enforces them forever.
  *
  * State per source: one long (tokens consumed) — constant size,
  * hash-partitioned by the state store; quotas ship with the operator
  * as a plain broadcast-sized map (k sources). Within a micro-batch,
  * rows fold in doc_id order; across batches the feed is id-ordered
  * per source up to the batch boundary — the [[StreamingDedup]] /
  * [[StreamingAsof]] ordered-feed contract, and what makes any
  * micro-batch split reproduce the batch gate's window exactly
  * (spec-pinned).
  *
  * Note the gate is "admit while cum ≤ quota", NOT first-fit packing:
  * one over-budget doc blocks its source's tail deterministically —
  * identical to the batch window semantics, which is the point.
  */
object StreamingQuota {

  case class DocTokens(doc_id: Long, source: String, n_tokens: Long)
  case class Gated(
      doc_id: Long, source: String, n_tokens: Long,
      cum_tokens: Long, admitted: Boolean)

  /** Gate a (doc_id, source, n_tokens) stream against fixed per-source
    * quotas. Works identically on a batch Dataset (one fold per source
    * from empty state).
    */
  def gate(rows: Dataset[DocTokens], quotas: Map[String, Long]): Dataset[Gated] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.source)
      .flatMapGroupsWithState[Long, Gated](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[DocTokens], state: GroupState[Long]) =>
          var consumed = state.getOption.getOrElse(0L)
          val quota = quotas.getOrElse(source, 0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            consumed += d.n_tokens
            Gated(d.doc_id, source, d.n_tokens, consumed, consumed <= quota)
          }
          state.update(consumed)
          out.iterator
      }
  }
}
