package graft

import graft.pipeline.SemanticDedup
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup within-cell pruning: drop iff SOME ≺-earlier cell-mate is
  * τ-close — the published upper-triangular rule, whose subtleties
  * (chain drops, cell isolation, rank policy, fail-safe cap) the
  * fixture oracle (q102) can't isolate individually.
  */
class SemanticDedupSpec extends AnyFunSuite with SharedSpark {

  private def rot(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("a dropped row still drops its own later neighbors (chain rule)") {
    import spark.implicits._
    // A at 0°, B at 20°, C at 40°, τ = 0.9: cos(A,B) = cos(B,C) ≈ 0.94
    // ≥ τ but cos(A,C) ≈ 0.77 < τ. The published rule drops C because
    // B ≺ C is τ-close — even though B itself is dropped (a greedy
    // keep-only-vs-kept variant would KEEP C; that is not SemDeDup).
    val df = Seq((1L, rot(0), 0L), (2L, rot(20), 0L), (3L, rot(40), 0L))
      .toDF("id", "emb", "cell")
    assert(keptIds(SemanticDedup.dedupWithinCells(
      df, "id", "emb", "cell", tau = 0.9, rankCol = "id")) == Set(1L))
  }

  test("pairs in different cells are never compared") {
    import spark.implicits._
    val df = Seq((1L, rot(0), 0L), (2L, rot(5), 1L))
      .toDF("id", "emb", "cell")
    assert(keptIds(SemanticDedup.dedupWithinCells(
      df, "id", "emb", "cell", tau = 0.9, rankCol = "id")) == Set(1L, 2L))
  }

  test("rank column picks the survivor (keep-best-quality policy)") {
    import spark.implicits._
    // τ-close pair; quality rank 1 beats rank 5 regardless of id order
    val df = Seq((1L, rot(0), 0L, 5L), (2L, rot(5), 0L, 1L))
      .toDF("id", "emb", "cell", "quality_rank")
    assert(keptIds(SemanticDedup.dedupWithinCells(
      df, "id", "emb", "cell", tau = 0.9, rankCol = "quality_rank")) == Set(2L))
  }

  test("composes with IVF cells + closest-to-centroid rank (production shape)") {
    // The paper's actual configuration: KMeans cells as the comparison
    // domain, distance-to-centroid as the survivor order. Verified
    // against an independent driver-side brute force that calls the
    // SAME VectorOps.cosine kernel, so threshold decisions are
    // bit-identical and the only thing under test is the operator's
    // join/anti-join logic.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup-ivf").toString
    val e = Tables(spark, Sf0001, "embeddings").select("vec_id", "embedding")
    graft.query.IvfIndex.build(e, "vec_id", "embedding", dir,
      graft.query.IvfIndex.Params(nCentroids = 8))
    val meta = spark.read.parquet(s"$dir/cells_meta")
    val members = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("__raw").setOutputCol("__f").setP(2.0)
      .transform(spark.read.parquet(s"$dir/cells")
        .withColumn("__raw", org.apache.spark.ml.functions.array_to_vector(
          col("embedding").cast("array<double>"))))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        org.apache.spark.ml.functions.vector_to_array(col("__f"))
          .cast("array<float>").as("__norm"))
      .join(meta.select(col("centroid_id"), col("center")), "centroid_id")
      .withColumn("d", sqrt(graft.functions.l2_dist_sq(col("__norm"), col("center"))))
      .select("vec_id", "embedding", "centroid_id", "d")
    val tau = 0.35
    val kept = keptIds(SemanticDedup.dedupWithinCells(
        members, "vec_id", "embedding", "centroid_id", tau, rankCol = "d")
      .withColumnRenamed("vec_id", "id"))

    val rows = members.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).toArray, r.getInt(2), r.getDouble(3)))
    def precedes(a: (Long, Array[Float], Int, Double),
        b: (Long, Array[Float], Int, Double)): Boolean =
      b._4 < a._4 || (b._4 == a._4 && b._1 < a._1)
    val expected = rows.filter { a =>
      !rows.exists(b => b._3 == a._3 && precedes(a, b) &&
        graft.functions.VectorOps.cosine(a._2, b._2) >= tau)
    }.map(_._1).toSet
    assert(kept == expected)
    assert(kept.size < rows.length, "dedup dropped nothing — vacuous fixture")
  }

  test("an over-cap cell fails safe: every member kept, other cells still dedup") {
    import spark.implicits._
    val df = Seq(
      // cell 0: three τ-close rows, over the cap of 2 -> excluded from
      // comparison, ALL kept (dedup's safe direction)
      (1L, rot(0), 0L), (2L, rot(5), 0L), (3L, rot(10), 0L),
      // cell 1: τ-close pair under the cap -> still dedups
      (4L, rot(0), 1L), (5L, rot(5), 1L))
      .toDF("id", "emb", "cell")
    assert(keptIds(SemanticDedup.dedupWithinCells(
      df, "id", "emb", "cell", tau = 0.9, rankCol = "id",
      maxCellSize = 2)) == Set(1L, 2L, 3L, 4L))
  }
}
