package graft.streaming

import graft.pipeline.HeavyHitters
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Continuous Misra–Gries heavy-hitter maintenance — the streaming
  * face of [[graft.pipeline.HeavyHitters]] (same kernel, same
  * guarantee), for "which keys are getting hot RIGHT NOW" over an
  * unbounded stream where re-scanning for an exact recount is not an
  * option.
  *
  * Sharding: items are hash-split into [[Shards]] substreams and each
  * shard keeps ONE k-counter summary as `mapGroupsWithState` state —
  * state is k counters per shard, constant in stream length. Every
  * item's full count lands in exactly one shard, so the per-shard
  * retention guarantee (present if substream-freq > n_shard/(k+1)) is
  * STRONGER than the global one (n_shard ≤ n); a reader unions the
  * shard summaries and gets a candidate superset exactly like the
  * batch pass-1, to recount or alert on downstream.
  *
  * Each micro-batch folds its new arrivals through a local MG summary
  * and merges it into the state with the mergeable-summaries rule; the
  * Agarwal et al. 2012 bound is closed under arbitrary merge trees, so
  * the chained per-batch merges keep the deficit ≤ n_shard/(k+1)
  * regardless of how the stream was batched — that batching-invariance
  * is what the spec pins.
  *
  * Emission (update mode): the full current summary of any shard that
  * saw data, tagged with a per-shard generation counter so readers can
  * identify each shard's latest summary without comparing timestamps.
  */
object StreamingHitters {

  case class ShardState(gen: Long, counters: Map[String, Long])
  case class ShardSummary(shard: Int, gen: Long, item: String, cnt: Long)

  /** Shard fan-out. At 100 TB-scale this is the state-parallelism
    * knob: summaries per shard stay k counters; raise it to spread
    * update load, never to fit data.
    */
  val Shards = 8

  def shardOf(item: String): Int = math.floorMod(item.hashCode, Shards)

  /** Fold a (possibly streaming) item dataset into per-shard running
    * MG summaries of `k` counters. Works identically on a batch
    * Dataset (each group folds once from empty state).
    */
  def hitterSummaries(items: Dataset[String], k: Int): Dataset[ShardSummary] = {
    import items.sparkSession.implicits._
    items
      .map(s => (shardOf(s), s))
      .groupByKey(_._1)
      .mapGroupsWithState[ShardState, List[ShardSummary]](
        GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[(Int, String)], state: GroupState[ShardState]) =>
          val prev = state.getOption.getOrElse(ShardState(0L, Map.empty))
          val merged = HeavyHitters.mgMerge(
            prev.counters, HeavyHitters.mgSummary(it.map(_._2), k), k)
          val next = ShardState(prev.gen + 1L, merged)
          state.update(next)
          merged.toList.map { case (t, c) => ShardSummary(shard, next.gen, t, c) }
      }
      .flatMap(identity)
  }
}
