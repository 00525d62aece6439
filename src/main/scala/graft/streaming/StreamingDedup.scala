package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Continuous EXACT dedup — the streaming face of
  * [[graft.pipeline.Dedup.exact]]'s contract: of all documents
  * sharing a content hash, exactly one survives, and it is the FIRST
  * to arrive. This is the admission gate a continuously-ingesting
  * training pipeline runs on every incoming batch ("have we already
  * got this exact payload?") without re-scanning the corpus.
  *
  * State: keyed by the 32-byte sha-256 of the content, one boolean-
  * sized entry per DISTINCT payload ever admitted (the id of the
  * admitted row, kept for audit emission). Duplicate arrivals touch
  * their key's state and emit nothing. State is per-key and
  * hash-partitioned — the same sharding any exact dedup shuffle does,
  * just persistent; at 100 TB the state store holds one small row per
  * distinct document, which is the irreducible memory of the exactness
  * contract (a false-positive-tolerant deployment swaps in a Bloom
  * filter per partition — a documented relaxation, not this operator).
  *
  * Batching-invariance (the spec-pinned property): concatenating the
  * admitted rows across any micro-batch split of the stream equals the
  * batch "first occurrence per sha" answer over the same arrival
  * order. Within one micro-batch, "first" = lowest `orderCol` (arrival
  * is only defined up to the batch boundary), so the two faces agree
  * deterministically.
  */
object StreamingDedup {

  case class Admitted(content_sha: String, doc_id: Long)

  /** Admit only first-seen payloads. `df` must have `idCol` (long,
    * the within-batch arrival order) and `textCol` (the payload).
    * Works identically on a batch frame (each key folds once from
    * empty state).
    */
  def admitFirst(df: DataFrame, idCol: String, textCol: String): Dataset[Admitted] = {
    import df.sparkSession.implicits._
    df.select(
        sha2(col(textCol), 256).as("content_sha"),
        col(idCol).cast("long").as("doc_id"))
      .as[Admitted]
      .groupByKey(_.content_sha)
      .flatMapGroupsWithState[Long, Admitted](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (sha: String, rows: Iterator[Admitted], state: GroupState[Long]) =>
          if (state.exists) {
            // payload already admitted in an earlier batch — drop all
            Iterator.empty
          } else {
            // first batch containing this payload: admit its lowest id
            val first = rows.minBy(_.doc_id)
            state.update(first.doc_id)
            Iterator.single(first)
          }
      }
  }
}
