package graft

import graft.query.{IvfIndex, SimilaritySearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfIndexSpec extends AnyFunSuite with SharedSpark {

  test("IVF build partitions cells; probed top-k recalls the exact top-k") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val e = Tables(spark, Sf0001, "embeddings").select("vec_id", "embedding")
    IvfIndex.build(e, "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 8))

    // partitioned layout on disk
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).length
    assert(cellDirs > 1 && cellDirs <= 8)
    assert(spark.read.parquet(s"$dir/cells").count() == e.count())

    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    // the fixture embeddings are near-uniform on the sphere (no cluster
    // structure), the worst case for IVF — probe 6 of 8 cells for a
    // stable recall bound; clustered corpora need far fewer probes
    val ivf = IvfIndex.queryTopK(spark, dir, "vec_id", "embedding",
        queries, "query_id", "qvec", k = 5, threshold = 0.0, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SimilaritySearch.topKBatch(
        e, "embedding", "vec_id", queries, "query_id", "qvec", k = 5, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below bound (got ${ivf.size} hits)")
  }
}
