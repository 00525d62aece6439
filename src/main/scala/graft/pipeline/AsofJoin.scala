package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no built-in for.
  * For every left row, attach the payload of the right row with the
  * greatest time ≤ the left row's time (or strictly < with
  * `strict = true`), within the same key group. This is the canonical
  * temporal-alignment primitive: trade-vs-quote, event-vs-last-config,
  * purchase-vs-last-touch attribution.
  *
  * Shape (the scalable formulation, not a per-row subquery): tag both
  * sides, union them on (key, time), and take a running
  * `last(payload, ignoreNulls)` over one partition-sorted window, then
  * keep only left rows. Cost = ONE hash shuffle of each side on the key
  * plus a per-partition sort — the same cost class as a sort-merge join.
  * No point-in-time cross product, no broadcast of either side, no
  * driver-side state; at 100 TB both sides shuffle once and nothing
  * else moves. A hot key degrades to one partition's sort (same as any
  * keyed window); salt upstream if a single key exceeds a partition.
  *
  * Inclusive-vs-strict is encoded purely in the sort: right rows order
  * before left rows at equal time for ≤ (payload visible), after them
  * for < (payload not yet visible) — no extra pass, no conditional
  * logic in the frame.
  *
  * Right rows must be unique per (key, time): with duplicates, which
  * payload wins would depend on partition-internal order. Dedup the
  * right side deterministically upstream (e.g. `max_by` per (key, time)
  * — see [[Events.purchaseAttribution]]).
  *
  * Reference behavior context: the reference engine has no temporal
  * join at all (`/root/reference/src/clients/vector-client.ts` is a
  * RAG client); this is a Part-B extension (SURVEY §2) for
  * training-data pipelines.
  */
object AsofJoin {

  /** Backward as-of join; the matched right payload lands in a struct
    * column named `asofCol` (null when no right row qualifies —
    * left-outer semantics).
    *
    * @param payloadCols right-side columns to carry; names are
    *                    preserved as struct fields
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      payloadCols: Seq[String],
      strict: Boolean = false,
      asofCol: String = "asof"): DataFrame = {
    // right sorts before left at equal time for inclusive (payload at
    // t == left.t is visible), after it for strict
    val rightTag = if (strict) 1 else -1
    val payload: Column = struct(payloadCols.map(col): _*)
    // a null right time/key must match NOTHING — unfiltered, a null-time
    // row sorts FIRST in the ascending window and its (non-null) payload
    // would be served as the running last() to every left row with no
    // earlier real match
    val r = right
      .filter(col(key).isNotNull && col(time).isNotNull)
      .select(
        col(key).as("__k"), col(time).as("__t"),
        lit(rightTag).as("__s"), payload.as("__p"))
    val payloadType = r.schema("__p").dataType
    val l = left
      .withColumn("__k", col(key))
      .withColumn("__t", col(time))
      .withColumn("__s", lit(-rightTag))
      .withColumn("__p", lit(null).cast(payloadType))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(asofCol, last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__s") === lit(-rightTag))
      .drop("__k", "__t", "__s", "__p")
  }
}
