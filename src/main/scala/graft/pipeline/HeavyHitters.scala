package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-item mining over an unbounded key stream — the
  * sub-linear-memory path to "which n-grams are boilerplate", "which
  * keys are hot", "which templates dominate the crawl" when the key
  * space is far too large to hash-aggregate in memory.
  *
  * Two passes, both single-shuffle-free over the stream:
  *
  *  1. **Sketch**: each partition folds its rows through a Misra–Gries
  *     summary of `k` counters (Misra & Gries 1982); the per-partition
  *     summaries (each ≤ k entries — aggregate-sized, not data-sized)
  *     merge pairwise by the mergeable-summaries rule (combine counts,
  *     subtract the (k+1)-th largest, drop non-positives — Agarwal et
  *     al., PODS 2012), which preserves the deficit bound n/(k+1).
  *     Every item with true frequency > n/(k+1) is guaranteed to
  *     survive; the summary is a SUPERSET of the answer, never a
  *     sample of it.
  *  2. **Recount**: one exact aggregation restricted to the ≤ k
  *     candidates (an `InSet` pre-filter, codegen'd; everything else
  *     lands in one "other" bucket so the same pass also yields the
  *     exact stream length n), then keep candidates with cnt·k > n.
  *
  * Because pass 1 is a guaranteed superset and pass 2 recounts exactly,
  * the output EQUALS the exact "HAVING count(*)·k > n" answer — the
  * approximation affects memory, never results. That equality is the
  * DuckDB oracle contract (q86).
  *
  * 100 TB shape: pass 1 is map-side only (one tiny object per
  * partition crosses the wire); pass 2 shuffles at most k+1 partial
  * rows per map task. Nothing is ever keyed by the raw stream — the
  * classic two-pass heavy-hitter harness (Cormode & Hadjieleftheriou,
  * VLDB 2008 survey shape).
  */
object HeavyHitters {

  /** Fold a partition through a k-counter Misra–Gries summary.
    * Deficit invariant: true_freq(x) - counter(x) ≤ d where d is the
    * number of decrement rounds, and (k+1)·d ≤ n, so any x with
    * true_freq > n/(k+1) has counter > 0 and is present.
    */
  def mgSummary(iter: Iterator[String], k: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    val dead = scala.collection.mutable.ArrayBuffer.empty[String]
    iter.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // decrement round: one "vote" leaves every counter (and the
          // unstored arrival cancels against them)
          dead.clear()
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1) }
          dead.foreach(m.remove)
      }
    }
    m.toMap
  }

  /** Merge two summaries back under k counters: sum counts, then
    * subtract the (k+1)-th largest merged count from everything and
    * drop non-positives (a batched decrement round — each subtraction
    * is matched by ≥ k+1 counted-then-uncounted items, so the combined
    * deficit stays ≤ (n_a + n_b)/(k+1)). Commutative and associative
    * up to the retained-set guarantee, which is what reduce-order
    * independence requires.
    */
  def mgMerge(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    a.foreach { case (t, c) => m.update(t, c) }
    b.foreach { case (t, c) => m.update(t, m.getOrElse(t, 0L) + c) }
    if (m.size <= k) m.toMap
    else {
      val kth = m.values.toArray.sortWith(_ > _).apply(k)
      m.iterator.collect { case (t, c) if c - kth > 0 => t -> (c - kth) }.toMap
    }
  }

  /** Exact frequent items of a single string column `col`: all values
    * with count·k > n, via the sketch-then-recount harness above.
    * Output: (item, cnt) — cnt exact, ordered by cnt desc then item.
    */
  def frequentItems(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(itemCol).cast("string")).as[String]
    // Partial summaries merge ON EXECUTORS via treeAggregate: each
    // tree level reduces the partial count by the aggregation scale,
    // so the driver receives O(scale) summaries (each ≤ k entries),
    // never one per map partition. At 100 TB / 128 MB splits that is
    // the difference between ~dozens and ~800k summaries at the
    // driver. treeAggregate's zero (empty map) is mgMerge's identity,
    // and it returns the zero on an empty plan — no reduce-on-empty
    // special case needed.
    val merged = items.rdd
      .mapPartitions(it => Iterator.single(mgSummary(it, k)))
      .treeAggregate(Map.empty[String, Long])(
        (a, b) => mgMerge(a, b, k), (a, b) => mgMerge(a, b, k), depth = 3)
    val candidates: Seq[String] = merged.keys.toSeq.sorted
    // MG on a nonempty stream always retains something — no candidates
    // means no data, so skip the recount scan entirely
    if (candidates.isEmpty)
      return df.select(col(itemCol).cast("string"), lit(0L).as("cnt")).limit(0)
    val byBucket = df
      .select(when(col(itemCol).isInCollection(candidates), col(itemCol))
        .as("__cand"))
      .groupBy("__cand").agg(count(lit(1)).as("cnt"))
    val total = byBucket.agg(sum(col("cnt")).as("__n"))
    byBucket
      .filter(col("__cand").isNotNull)
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(k.toLong) > col("__n"))
      .select(col("__cand").as(itemCol), col("cnt"))
      .orderBy(col("cnt").desc, col(itemCol))
  }

  /** Q86: frequent word trigrams of the document corpus — the
    * boilerplate-mining pass a C4/CCNet-style cleaner runs before
    * deciding what to strip. k=4000 counters against ~16k distinct
    * grams at sf0.01 (the eviction path genuinely exercises); the
    * oracle is the exact HAVING-threshold answer, which the harness
    * must equal by construction.
    */
  def q86FrequentGrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.parallelize(Tables(spark, dir, "documents"))
    val grams = docs.select(
      explode(TextAnalysis.wordGrams(
        split(trim(col("text")), "\\s+"), 3)).as("gram"))
    frequentItems(grams, "gram", k = 4000)
  }
}
