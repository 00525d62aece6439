package graft

import graft.ingest.{IngestJob, JdbcSink, ParquetSink}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IndexSinkSpec extends AnyFunSuite with SharedSpark {

  test("ParquetSink round-trips the ingest index") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/idx"
    IngestJob.run(spark, Sf0001, ParquetSink(out), IngestJob.Config())
    val readBack = spark.read.parquet(out)
    assert(readBack.count() == IngestJob.index(spark, Sf0001).count())
    assert(readBack.columns.toSet ==
      Set("doc_id", "chunk_id", "piece_id", "content", "embedding", "metadata"))
  }

  test("JdbcSink rejects injection-shaped table identifiers at construction") {
    for (bad <- Seq("docs; DROP TABLE x", "a\"b", "a b", "1abc", "a.b.c", "", "a-.b"))
      assertThrows[IllegalArgumentException](
        JdbcSink("jdbc:postgresql://db/corpus", bad))
    for (ok <- Seq("graft_index", "public.graft_index", "_t1"))
      JdbcSink("jdbc:postgresql://db/corpus", ok) // must construct
    assertThrows[IllegalArgumentException](
      JdbcSink("postgresql://db/corpus", "graft_index")) // not a jdbc url
  }

  test("JdbcSink serializes embedding + metadata to JDBC-safe columns") {
    val serialized = JdbcSink.serialized(IngestJob.index(spark, Sf0001).limit(5))
    val row = serialized.select("embedding", "metadata").first()
    // comma-joined vector body (the reference's wire shape) and JSON metadata
    assert(row.getString(0).split(",").length == IngestJob.Config().embedDim)
    assert(row.getString(1).startsWith("{") && row.getString(1).contains("\"header\""))
    // schema is now JDBC-plain: no arrays or structs remain
    assert(serialized.schema.fields.forall(f =>
      !f.dataType.typeName.contains("array") && !f.dataType.typeName.contains("struct")))
  }

  test("a valid JdbcSink reaches the JDBC layer (no driver in this env)") {
    val sink = JdbcSink("jdbc:postgresql://nowhere:5432/corpus", "graft_index")
    val df = IngestJob.index(spark, Sf0001).limit(1)
    // zero-egress container: the write must fail in the JDBC driver
    // lookup — NOT in identifier validation — proving the plan wiring
    val e = intercept[Exception](sink.write(df, SaveMode.Append))
    assert(!e.isInstanceOf[IllegalArgumentException])
  }

  test("JdbcSink round-trips through a real JDBC database (embedded Derby)") {
    // Derby ships on the Spark classpath, so this exercises the sink
    // end-to-end through an actual JDBC connection: write the serving
    // rows, read them back over JDBC, and parse the two wire shapes —
    // comma-joined vector body and JSON metadata — back into the
    // source values
    val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").toString
    val url = s"jdbc:derby:$dbDir/servedb;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    val src = IngestJob.index(spark, Sf0001).limit(20).cache()
    JdbcSink(url, "graft_index", Map("driver" -> driver))
      .write(src, SaveMode.Overwrite)

    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "graft_index")
      .option("driver", driver).load()
    assert(back.count() == src.count())

    // vector wire shape parses back to the exact float embedding
    def key(c: String) = col(c).cast("long")
    val parsed = back.select(key("doc_id"), key("chunk_id"), key("piece_id"),
        split(col("embedding"), ",").cast("array<float>").as("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getSeq[Float](3))
      .toMap
    val want = src.select(key("doc_id"), key("chunk_id"), key("piece_id"),
        col("embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getSeq[Float](3))
      .toMap
    assert(parsed == want)

    // JSON metadata wire shape parses back to the source struct fields
    val metaSchema = src.schema("metadata").dataType
    val metaBack = back.select(key("doc_id"), key("chunk_id"), key("piece_id"),
        from_json(col("metadata"), metaSchema).as("m"))
      .select(col("doc_id"), col("chunk_id"), col("piece_id"),
        col("m.header").as("header"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getString(3))
      .toMap
    val metaWant = src.select(key("doc_id"), key("chunk_id"), key("piece_id"),
        col("metadata.header"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getString(3))
      .toMap
    assert(metaBack == metaWant)
    src.unpersist()
  }
}
