package graft.pipeline

import graft.functions.cosine_sim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — SemDeDup (Abbas
  * et al., "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540): cluster the corpus into
  * cells, compare pairs only WITHIN a cell, and drop every row whose
  * cosine to some ≺-earlier cell-mate reaches the threshold. This is
  * the published semantics (the reference implementation's
  * upper-triangular max-similarity test): the ≺-order is a total
  * order per cell, a row is dropped iff SOME earlier row is τ-close —
  * whether or not that earlier row itself survives — so the decision
  * for each row is independent and the whole pass is one join, no
  * sequential sweep.
  *
  * The cell assignment is a caller-supplied column, not computed here:
  * in production it is the IVF cell id ([[graft.query.IvfIndex]]'s
  * KMeans assignment, the paper's k-means clustering); any
  * deterministic coarse bucketing works. The assignment bounds which
  * pairs are COMPARED — τ-close pairs landing in different cells are
  * simply not considered, the paper's documented recall trade — but
  * never flips the outcome of a comparison that does happen.
  *
  * Scale shape (100 TB): one shuffle of (cell, id, embedding) keys
  * both sides of a co-partitioned self-join; per-cell cost is the
  * algorithm's inherent O(|cell|²) cosine evaluations — bounded by
  * sizing nCentroids ∝ N so cells stay ~constant (the paper runs ~50k
  * clusters at web scale), with [[graft.util.BucketGuard]] as the
  * backstop: an over-cap cell is excluded from comparison with a
  * logged drop count, which fails SAFE for dedup — its rows are all
  * KEPT, never wrongly discarded. The dropped-id side of the anti-join
  * carries ids only, never payloads.
  */
object SemanticDedup {

  /** Survivors of within-cell semantic dedup: `df` minus every row
    * with a ≺-earlier τ-close cell-mate, ≺ = (rankCol asc, idCol asc).
    * Pass the distance-to-centroid as `rankCol` for the paper's
    * keep-closest-to-centroid policy, a quality score for
    * keep-best-quality, or the id itself for keep-first.
    *
    * @param maxCellSize occupancy cap: cells above it are excluded
    *        from comparison (all members kept) with a logged count —
    *        see [[graft.util.BucketGuard.capOccupancy]]
    */
  def dedupWithinCells(
      df: DataFrame,
      idCol: String,
      embCol: String,
      cellCol: String,
      tau: Double,
      rankCol: String,
      maxCellSize: Int = 100000): DataFrame = {
    require(tau > -1.0 && tau <= 1.0, "tau in (-1, 1]")
    // .distinct: rankCol may BE idCol (the keep-first policy)
    val side = graft.util.BucketGuard.capOccupancy(
      df.select(Seq(cellCol, idCol, embCol, rankCol).distinct.map(col): _*),
      Seq(cellCol), maxCellSize, "SemanticDedup.dedupWithinCells")
    val precedes =
      col(s"b.$rankCol") < col(s"a.$rankCol") ||
        (col(s"b.$rankCol") === col(s"a.$rankCol") &&
          col(s"b.$idCol") < col(s"a.$idCol"))
    val droppedIds = side.as("a")
      .join(side.as("b"),
        col(s"a.$cellCol") === col(s"b.$cellCol") && precedes &&
          cosine_sim(col(s"a.$embCol"), col(s"b.$embCol")) >= tau)
      .select(col(s"a.$idCol")).distinct()
    df.join(droppedIds, Seq(idCol), "left_anti")
  }
}
