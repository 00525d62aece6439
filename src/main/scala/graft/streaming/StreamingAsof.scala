package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous backward as-of attachment — the streaming face of
  * [[graft.pipeline.AsofJoin.backward]]: every event row gets the
  * payload of the latest reference row with time ≤ its own (inclusive),
  * per key, as events and reference updates arrive interleaved on a
  * stream. This is the live form of trade-vs-quote / event-vs-config /
  * last-touch attribution: the batch operator re-derives history,
  * this one carries it as state.
  *
  * Input model: ONE unioned stream of tagged rows (the same
  * union-then-scan formulation the batch operator uses), keyed by the
  * join key. `tag = 0` marks a reference (right) row carrying a
  * payload; `tag = 1` marks an event (left) row to be attributed.
  *
  * State per key: the latest reference (ts, payload) only — constant
  * size, no event buffering. Within a micro-batch, rows process in
  * (ts, tag) order, so a reference and an event in the same batch
  * resolve exactly like the batch sort (reference visible at equal
  * ts — inclusive semantics). ACROSS batches the operator assumes the
  * feed is time-ordered per key up to the batch boundary — the same
  * ordered-feed contract as [[StreamingDedup]] ("first" is arrival
  * order) and the replay fence in [[IndexMaintenance]]; a reference
  * row arriving AFTER an event it should have attributed is a
  * watermark violation upstream, not something latest-only state can
  * repair. The batch-equivalence spec pins exactly this: any
  * time-ordered micro-batch split of a feed produces the batch
  * operator's answer.
  *
  * 100 TB shape: state is one small row per key (hash-partitioned by
  * the state store); each micro-batch shuffles once on the key and
  * touches only its own rows — the streaming analogue of the batch
  * operator's one-shuffle-per-side cost.
  */
object StreamingAsof {

  case class Tagged(key: Long, ts: Long, tag: Int, id: Long, payload: String)
  case class Attributed(
      key: Long, ts: Long, id: Long,
      asof_ts: Option[Long], asof_payload: Option[String])

  /** Attach the latest reference payload (ts ≤ event ts, inclusive) to
    * every event row. Works identically on a batch Dataset (each key
    * folds once from empty state).
    */
  def attach(rows: Dataset[Tagged]): Dataset[Attributed] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, String), Attributed](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[Tagged], state: GroupState[(Long, String)]) =>
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Attributed]
          // (ts, tag, id): references sort before events at equal ts —
          // the inclusive rule, identical to the batch sort; id breaks
          // reference ties deterministically (last write at a ts wins)
          it.toSeq.sortBy(r => (r.ts, r.tag, r.id)).foreach { r =>
            if (r.tag == 0) last = Some((r.ts, r.payload))
            else out += Attributed(key, r.ts, r.id,
              last.map(_._1), last.map(_._2))
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
