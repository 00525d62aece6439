package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization + similarity over the quantized codes —
  * the memory/bandwidth lever for vector search at 100 TB: a 64-dim
  * float corpus is 256 B/row of vector payload; int8 codes are 64 B + one
  * scale, a 4× cut in shuffle bytes, cache footprint, and scan I/O, and
  * integer dot products vectorize better than float on every CPU. The
  * standard retrieval shape is quantized scoring for candidate ranking
  * with optional float re-scoring of the short list; q52 gates the
  * quantized scoring path itself.
  *
  * Determinism discipline (what keeps this oracle-checkable bit-for-bit
  * in any engine): per-vector symmetric max-abs scaling with `floor`
  * (no round — a .5 tie would hang on rounding-mode agreement), exact
  * long dot products, and a final `dot / (sqrt(nq)·sqrt(nc))` whose
  * `sqrt` is IEEE correctly-rounded everywhere. Quantized cosine error
  * vs float cosine is O(1/127) per the standard bound — a ranking
  * permutation among near-ties, which is why scores carry an explicit
  * total order (score DESC, id ASC) everywhere.
  */
object QuantizedSearch {

  /** Symmetric per-vector int8 code: `floor(x · 127 / max|x|)`, values
    * in [-127, 127] (as longs for exact downstream arithmetic; storage
    * would cast to tinyint). The all-zero vector quantizes to zeros.
    */
  def quantize(v: Column): Column = {
    val ma = array_max(transform(v, x => abs(x))).cast("double")
    when(ma === 0.0, transform(v, _ => lit(0L)))
      .otherwise(transform(v,
        x => floor(x.cast("double") * lit(127.0) / ma).cast("long")))
  }

  /** Exact integer dot product of two code arrays. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Cosine over int8 codes; 0.0 when either side is all-zero. */
  def quantizedCosine(dot: Column, nq: Column, nc: Column): Column =
    when(nq === 0L || nc === 0L, lit(0.0))
      .otherwise(dot.cast("double")
        / (sqrt(nq.cast("double")) * sqrt(nc.cast("double"))))

  /** Batch top-k retrieval scored on quantized codes. Queries are the
    * (small) batch side and broadcast; the corpus streams — at scale
    * this is a map-only pass over the corpus (shuffle only for the
    * per-query top-k), moving int8-sized payloads instead of floats.
    */
  def topKBatch(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol), quantize(col(vecCol)).as("__c"))
      .withColumn("__nc", intDot(col("__c"), col("__c")))
    val q = queries.select(col(queryIdCol), quantize(col(queryVecCol)).as("__q"))
      .withColumn("__nq", intDot(col("__q"), col("__q")))
    c.crossJoin(broadcast(q))
      .withColumn("__dot", intDot(col("__q"), col("__c")))
      .withColumn("qsim",
        quantizedCosine(col("__dot"), col("__nq"), col("__nc")))
      // answer-sized shuffle: map-side partial top-k per query, not a
      // corpus-sized row_number window (see SimilaritySearch.topKExplode)
      .transform(SimilaritySearch.topKExplode(_, queryIdCol, idCol, "qsim", k))
  }
}
