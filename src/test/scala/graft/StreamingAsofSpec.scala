package graft

import graft.pipeline.AsofJoin
import graft.streaming.StreamingAsof
import graft.streaming.StreamingAsof.Tagged
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingAsofSpec extends AnyFunSuite with SharedSpark {

  /** Deterministic interleaved feed: per key, reference updates at
    * irregular times and events scattered between/before/after them.
    */
  private def feed: Vector[Tagged] = {
    val rnd = new scala.util.Random(29)
    val rows = for {
      key <- 0L until 4L
      i <- 0 until 30
    } yield {
      val ts = rnd.nextInt(1000).toLong
      if (i % 3 == 0) Tagged(key, ts, 0, key * 1000 + i, s"ref_${key}_$i")
      else Tagged(key, ts, 1, key * 1000 + i, "")
    }
    rows.toVector
  }

  private def expectedViaBatchOperator(rows: Seq[Tagged]) = {
    import spark.implicits._
    val left = rows.filter(_.tag == 1)
      .toDF().select(col("key"), col("ts"), col("id"))
    val right = rows.filter(_.tag == 0)
      .toDF().select(col("key"), col("ts"), col("id"), col("payload"))
      // batch contract: unique per (key, ts) — keep the max id, the
      // same last-write-wins rule the streaming sort applies
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key", "ts").orderBy(col("id").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    AsofJoin.backward(left, right, "key", "ts", Seq("ts", "payload"))
      .select(col("key"), col("ts"), col("id"),
        col("asof.ts").as("asof_ts"), col("asof.payload").as("asof_payload"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4))))
      .toSet
  }

  test("time-ordered micro-batch splits reproduce the batch as-of join") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = feed.sortBy(r => (r.ts, r.tag, r.id))
    // any time-ordered split must give the same answer: cut at uneven
    // boundaries so references and their events land in different batches
    val batches = Seq(all.take(17), all.slice(17, 61), all.drop(61))

    val input = MemoryStream[Tagged]
    val q = StreamingAsof.attach(input.toDS())
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("asof_out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4))))
      .toSet
    assert(got == expectedViaBatchOperator(feed))
    // events with no preceding reference surface with null attribution,
    // not dropped (left-outer parity with the batch operator)
    assert(got.exists(_._4.isEmpty) || feed.filter(_.tag == 1).forall(e =>
      feed.exists(r => r.tag == 0 && r.key == e.key && r.ts <= e.ts)))
  }

  test("batch face: one fold from empty state equals the batch operator too") {
    import spark.implicits._
    val got = StreamingAsof.attach(feed.toDS())
      .collect()
      .map(a => (a.key, a.ts, a.id, a.asof_ts, a.asof_payload)).toSet
    assert(got == expectedViaBatchOperator(feed))
  }
}
