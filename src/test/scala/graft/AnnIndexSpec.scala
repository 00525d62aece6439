package graft

import graft.query.{AnnIndex, SimilaritySearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B-4: persisted index build + query path. The self-join equivalence is
  * covered by DedupEquivalenceSpec; here the index round-trips through
  * disk and serves a query batch.
  */
class AnnIndexSpec extends AnyFunSuite with SharedSpark {

  test("buildIndex persists model + prunable tables; queryTopK serves a batch from disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-index").toString
    val e = Tables(spark, Sf0001, "embeddings").select("vec_id", "embedding")
    AnnIndex.buildIndex(e, "vec_id", "embedding", dir)

    assert(new java.io.File(s"$dir/model").exists())
    // bucket rows: one per (vector, hash table), ids only, partitioned
    // by the probe directory key; vectors stored once, id-partitioned
    val buckets = spark.read.parquet(s"$dir/buckets")
    assert(buckets.count() == e.count() * AnnIndex.Params().numHashTables)
    assert(buckets.columns.toSet == Set("vec_id", "table", "bucket", "__bucket"))
    val vectors = spark.read.parquet(s"$dir/vectors")
    assert(vectors.count() == e.count())
    assert(vectors.columns.toSet == Set("vec_id", "embedding", "__vbucket"))
    assert(new java.io.File(s"$dir/buckets").listFiles()
      .exists(_.getName.startsWith("__bucket=")))

    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val ann = AnnIndex.queryTopK(spark, dir, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = SimilaritySearch.topKBatch(
        e, "embedding", "vec_id", queries, "query_id", "qvec", k = 5, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // the ANN result is a subset of legal hits with exact sims; recall
    // vs the exact top-k must be high at this table count (empirically 1
    // on the fixture — assert >= 0.8 to keep the test robust)
    val recall = ann.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"ANN top-k recall $recall too low (got ${ann.size} hits)")
    // every returned query got at most k hits
    assert(ann.groupBy(_._1).forall(_._2.size <= 5))
  }

  test("queryTopK fails loudly when the candidate volume exceeds the driver bound") {
    // The two driver collects are bounded by construction (batch ×
    // tables × occupancy) — but that bound is a configuration
    // property, so an injected tiny ceiling must trip the guard
    // instead of silently collecting past it.
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-guard").toString
    val e = Tables(spark, Sf0001, "embeddings").select("vec_id", "embedding")
    AnnIndex.buildIndex(e, "vec_id", "embedding", dir)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val err = intercept[IllegalArgumentException] {
      AnnIndex.queryTopK(spark, dir, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5, threshold = 0.0,
        maxDriverRows = 3).collect()
    }
    assert(err.getMessage.contains("driver-collect bound"), err.getMessage)
    assert(err.getMessage.contains("crossJoin"), err.getMessage)
    // at the default bound the same index + batch still serves
    assert(AnnIndex.queryTopK(spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", k = 5, threshold = 0.0).count() > 0)
  }

  test("two-dataset ANN cross join equals the exact cross join (sf0.001)") {
    import org.apache.spark.sql.functions._
    val e = Tables(spark, Sf0001, "embeddings").select("vec_id", "embedding")
    val a = e.filter(col("vec_id") % 2 === 0).withColumnRenamed("vec_id", "a_id")
    val b = e.filter(col("vec_id") % 2 === 1).withColumnRenamed("vec_id", "b_id")
    val ann = AnnIndex.crossJoin(a, "a_id", b, "b_id", "embedding", 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = a.as("x").crossJoin(b.as("y"))
      .withColumn("sim", graft.functions.cosine_sim(
        col("x.embedding"), col("y.embedding")))
      .filter(col("sim") >= 0.35)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann == exact)
  }
}
