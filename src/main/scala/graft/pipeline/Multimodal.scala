package graft.pipeline

import graft.Tables
import graft.functions.byte_histogram
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video treated as opaque
  * `binary` payloads with typed metadata, plus decode / frame-sample /
  * feature-extract over them.
  *
  * This container ships no codec libraries, so the DECODE step is a
  * deterministic stub ([[FakeCodec]]; the real-codec seam is
  * [[RealCodec.decode]], which deliberately throws). Everything around
  * the stub — the binary column, the metadata struct schema, the
  * per-frame explode, the histogram feature kernel, partitioning — is
  * real Spark plumbing and is what these operators exercise. All three
  * query outputs are arithmetic over bytes, so DuckDB oracles them.
  *
  * 100 TB shape: every operator here is row-local (narrow); the only
  * wide stage a real pipeline adds is the final write. Frame explode
  * multiplies rows, not bytes (each frame slice references the parent
  * payload), and the histogram kernel is one tight codegen'd loop/row.
  */
object Multimodal {

  val FrameBytes = 16
  val FrameStride = 4 // sample every 4th frame-block
  val HistBins = 16

  /** The real-codec seam: a production deployment implements this with
    * actual image/audio decoding. Deliberately unimplemented here — no
    * codec libs in the container; tests and oracles use [[FakeCodec]].
    */
  object RealCodec {
    def decode(payload: Array[Byte]): Nothing =
      throw new NotImplementedError(
        "real media decoding requires codec libraries not present in this build")
  }

  /** Deterministic stand-in codec: metadata derived arithmetically from
    * the payload so every downstream operator is golden-testable.
    */
  object FakeCodec {
    def widthCol(nBytes: Column): Column = lit(64) + nBytes % 64
    def heightCol(nBytes: Column): Column = lit(64) + (nBytes / 64).cast("long") % 64

    /** Executor-side form of the same stub, for the mapPartitions path. */
    def decodeBytes(payload: Array[Byte]): (Long, Long) = {
      val n = payload.length.toLong
      (64L + n % 64, 64L + (n / 64) % 64)
    }
  }

  /** The execution shape a REAL codec runs in: one codec instance per
    * partition, rows decoded in a partition-local loop, schema widened
    * with the decoded fields (this is the Scala analogue of a
    * mapInPandas decode UDF — batch-per-partition, typed output schema).
    * The codec is injected; production passes the real library,
    * everything else here stays identical.
    */
  def decodeWith(
      df: DataFrame,
      mediaCol: String,
      codec: Array[Byte] => (Long, Long)): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val outSchema = df.schema
      .add("width", LongType, nullable = false)
      .add("height", LongType, nullable = false)
    val idx = df.schema.fieldIndex(mediaCol)
    val c = codec
    df.mapPartitions { rows: Iterator[Row] =>
      rows.map { r =>
        val (w, h) = c(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ w :+ h)
      }
    }(Encoders.row(outSchema))
  }

  /** Synthesize the media table from the documents fixture: the UTF-8
    * payload stands in for an opaque media blob (pure-ASCII fixture, so
    * byte n == char n and DuckDB can oracle byte arithmetic).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.parallelize(Tables(spark, dir, "documents"))
      .select(
        col("doc_id"),
        col("text").cast("binary").as("media"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"))
      .withColumn("n_bytes", length(col("media")).cast("long"))

  /** Q26: metadata "decode" — typed struct per payload (width/height from
    * the stub codec, duration only for time-based media).
    */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("width", FakeCodec.widthCol(col("n_bytes")))
      .withColumn("height", FakeCodec.heightCol(col("n_bytes")))
      .withColumn("duration_ms",
        when(col("media_type") === "image", lit(0L))
          .otherwise(col("n_bytes") * 8))
      .select("doc_id", "media_type", "n_bytes", "width", "height", "duration_ms")
      .orderBy("doc_id")

  /** Q27: frame sampling — every [[FrameStride]]-th [[FrameBytes]]-byte
    * block of the payload, one row per sampled frame with its content
    * hash. Row-local explode; frames are substrings, not copies of the
    * full payload.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val nBlocks = ceil(col("n_bytes").cast("double") / FrameBytes).cast("long")
    mediaTable(spark, dir)
      .withColumn("n_blocks", nBlocks)
      .filter(col("n_blocks") > 0)
      .select(
        col("doc_id"), col("media_type"), col("media"), col("n_bytes"),
        posexplode(sequence(lit(0L), col("n_blocks") - 1, lit(FrameStride.toLong))))
      .select(
        col("doc_id"),
        col("pos").cast("int").as("frame_id"),
        col("col").as("block_idx"),
        md5(expr(s"substring(media, col * $FrameBytes + 1, $FrameBytes)")).as("frame_md5"),
        least(lit(FrameBytes.toLong), col("n_bytes") - col("col") * FrameBytes)
          .as("frame_bytes"))
      .orderBy("doc_id", "frame_id")
  }

  val ResizeStride = 2

  /** Q37: media "resize" — deterministic byte-stride downsample (every
    * [[ResizeStride]]-th byte) with the metadata recomputed for the new
    * payload; a real codec swaps the kernel for pixel resampling, the
    * schema/plumbing contract is identical. Row-local, no shuffle.
    */
  def resize(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("resized",
        graft.functions.byte_stride(col("media"), lit(ResizeStride)))
      .withColumn("resized_bytes", length(col("resized")).cast("long"))
      .select(
        col("doc_id"), col("media_type"),
        col("n_bytes").as("orig_bytes"),
        col("resized_bytes"),
        md5(col("resized")).as("resized_md5"),
        FakeCodec.widthCol(col("resized_bytes")).as("width"),
        FakeCodec.heightCol(col("resized_bytes")).as("height"))
      .orderBy("doc_id")

  /** Q28: byte-histogram feature extraction — [[HistBins]] buckets per
    * payload via the native kernel, exploded to scalar rows for the
    * oracle compare (the array form is `byte_histogram(media, bins)`).
    */
  def byteHistogram(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("n_bytes"),
        posexplode(byte_histogram(col("media"), lit(HistBins))))
      .select(
        col("doc_id"),
        col("pos").cast("int").as("bin"),
        col("col").as("n_in_bin"),
        // integer half-up rounding (the q31/q35/q36 tie-divergence fix):
        // `round(double, 6)` ties land differently in Spark vs DuckDB
        (expr("cast((col * 2000000 + n_bytes) div (n_bytes * 2) as double)") / 1000000.0)
          .as("frac"))
      .orderBy("doc_id", "bin")
}
