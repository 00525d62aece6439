package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The per-component sequential admission greedy shared by the
  * streaming dedup-admission faces ([[StreamingNearDup]] — Jaccard,
  * [[StreamingSemanticDedup]] — cosine): inside a connected component
  * of the verified in-batch pair graph, members are decided in
  * ascending-id (= arrival) order, each rejected iff it matches the
  * admitted corpus or an already-ADMITTED earlier member — the exact
  * semantics of the sequential greedy fold over arrival order, run
  * executor-side per component (components are the only places where
  * in-batch admissions interact, so this is where the fold cannot be
  * expressed relationally).
  */
object AdmissionGreedy {

  /** Tagged per-component row: kind 0 = member (a = id, dupOf/dupScore
    * = best corpus match or -1/NaN), kind 1 = verified in-batch edge
    * (a, b, score). Public only because encoder codegen cannot
    * deserialize a private class.
    */
  case class GroupRow(
      label: Long, kind: Int, a: Long, b: Long,
      score: Double, dupOf: Long, dupScore: Double)

  case class Verdict(
      doc_id: Long, admitted: Boolean,
      dup_of: Option[Long], score: Option[Double])

  /** Decide every labeled node. Inputs: `labels` (node, label) — the
    * connected components of the in-batch pair graph; `edges`
    * (d1, d2, score) — the verified in-batch pairs; `corpusMatch`
    * (doc_id, cm_dup, cm_score) — each node's best admitted-corpus
    * match, absent when none. Output: (doc_id, admitted, dup_of,
    * score), the rejected rows naming their best match by (score
    * desc, id asc).
    */
  def decide(
      labels: DataFrame,
      edges: DataFrame,
      corpusMatch: DataFrame): DataFrame = {
    val spark = labels.sparkSession
    import spark.implicits._
    val memberRows = labels
      .join(corpusMatch, labels("node") === corpusMatch("doc_id"), "left")
      .select(col("label"), lit(0).as("kind"), col("node").as("a"),
        lit(-1L).as("b"), lit(Double.NaN).as("score"),
        coalesce(col("cm_dup"), lit(-1L)).as("dupOf"),
        coalesce(col("cm_score"), lit(Double.NaN)).as("dupScore"))
    val edgeRows = edges
      .join(labels.select(col("node").as("d1"), col("label")), "d1")
      .select(col("label"), lit(1).as("kind"), col("d1").as("a"),
        col("d2").as("b"), col("score"),
        lit(-1L).as("dupOf"), lit(Double.NaN).as("dupScore"))
    memberRows.unionByName(edgeRows).as[GroupRow]
      .groupByKey(_.label)
      .flatMapGroups { (_: Long, it: Iterator[GroupRow]) =>
        val rows = it.toVector
        val members = rows.filter(_.kind == 0).sortBy(_.a)
        val adj = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Double)]]
        rows.filter(_.kind == 1).foreach { e =>
          adj.getOrElseUpdate(e.a, scala.collection.mutable.ArrayBuffer.empty) += ((e.b, e.score))
          adj.getOrElseUpdate(e.b, scala.collection.mutable.ArrayBuffer.empty) += ((e.a, e.score))
        }
        val admitted = scala.collection.mutable.Set.empty[Long]
        members.iterator.map { m =>
          val corpusHit =
            if (m.dupOf >= 0) Seq((m.dupOf, m.dupScore)) else Seq.empty
          val batchHits = adj.getOrElse(m.a, Seq.empty).filter(n => admitted(n._1))
          val hits = corpusHit ++ batchHits
          if (hits.isEmpty) {
            admitted += m.a
            Verdict(m.a, admitted = true, None, None)
          } else {
            val best = hits.maxBy(t => (t._2, -t._1))
            Verdict(m.a, admitted = false, Some(best._1), Some(best._2))
          }
        }
      }
      .toDF()
  }
}
