package graft.embed

import graft.functions.hash_embed
import graft.util.Retry
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Pluggable embedding seam (A-12, reference `createEmbeddings`,
  * src/clients/vector-client.ts:375-388). The deterministic core uses
  * [[HashingEmbedder]] so correctness tests are hermetic; a production
  * deployment swaps in a [[BatchedEmbedder]] whose transport calls a real
  * embedding service — the engine contract is only "add an array<float>
  * column".
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Return `df` with `outCol: array<float>` computed from `textCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame
}

/** Default: deterministic hashing-trick embedder, evaluated inside
  * whole-stage codegen (native expression, no UDF, no network).
  */
final class HashingEmbedder(val dim: Int) extends Embedder {
  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, hash_embed(col(textCol), lit(dim)))
}

object HashingEmbedder {
  val DefaultDim = 64
  def default: HashingEmbedder = new HashingEmbedder(DefaultDim)
}

/** External-service embedder skeleton: batches rows per partition and
  * calls the injected transport once per batch with retry + exponential
  * backoff (A-18). This replaces the reference's one-awaited-call-per-
  * chunk loop (vector-client.ts:149-151) with `ceil(rows/batchSize)`
  * calls per partition, issued from executors — the 100 TB shape.
  *
  * The transport is injected rather than implemented here: this
  * container has no network, and the deterministic test transport is
  * simply `texts => texts.map(VectorOps.hashEmbed(_, dim))`.
  */
final class BatchedEmbedder(
    val dim: Int,
    batchSize: Int,
    transport: Seq[String] => Seq[Array[Float]],
    maxRetries: Int = 5,
    initialDelayMs: Long = 500,
    // injectable so specs can pin the backoff SCHEDULE (500, 1000, ...)
    // without real sleeps; production uses the default
    sleep: Long => Unit = Thread.sleep) extends Embedder {

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val bs = batchSize
    val retries = maxRetries
    val delay = initialDelayMs
    val t = transport
    val s = sleep
    df.mapPartitions { rows: Iterator[Row] =>
      rows.grouped(bs).flatMap { batch =>
        val vecs = Retry.withBackoff(retries, delay, s)(t(batch.map(_.getString(textIdx))))
        require(vecs.length == batch.length,
          s"transport returned ${vecs.length} vectors for ${batch.length} texts")
        batch.lazyZip(vecs).map { (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(Encoders.row(outSchema))
  }
}
