package graft

import graft.pipeline.DriftMonitor
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed ppm drift arithmetic + the new/gone bucket contract;
  * the q104 oracle verifies the composition on the fixture.
  */
class DriftMonitorSpec extends AnyFunSuite with SharedSpark {

  test("hand-computed shares, summands, and status flags") {
    import spark.implicits._
    val ref = (Seq.fill(8)("a") ++ Seq.fill(2)("b")).toDF("bucket")
    val cur = (Seq.fill(5)("a") ++ Seq.fill(5)("c")).toDF("bucket")
    val out = DriftMonitor.chiSquareDrift(ref, cur, Seq("bucket"))
      .orderBy("bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    assert(out.toSeq == Seq(
      // a: shares 800000 -> 500000; (3e5)^2 div 8e5 = 112500
      ("a", 8L, 5L, 800000L, 500000L, 112500L, "ok"),
      // b gone: whole reference share, (2e5)^2 div 2e5 = 200000
      ("b", 2L, 0L, 200000L, 0L, 200000L, "gone"),
      // c new: no reference share -> the max(ref_ppm, 1) floor makes
      // its summand dominate, which is the intended alarm shape
      ("c", 0L, 5L, 0L, 500000L, 250000000000L, "new")))
  }

  test("streamed cumulative drift equals the batch comparison; replays fenced") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables(spark, Sf0001, "documents").select("doc_id", "source", "lang")
    val ref = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val curRows = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select("source", "lang").as[(String, String)].collect().toSeq

    val state = java.nio.file.Files.createTempDirectory("graft-drift-state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-drift-ckpt").toString
    graft.streaming.StreamingDrift.buildReference(ref, Seq("source", "lang"), state)

    val input = MemoryStream[(String, String)]
    val q = graft.streaming.StreamingDrift.maintain(
      input.toDS().toDF("source", "lang"), state, Seq("source", "lang"), ckpt)
    try {
      val (b1, b2) = curRows.splitAt(curRows.size / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    val streamed = rows(graft.streaming.StreamingDrift.report(spark, state))
    val batch = rows(graft.pipeline.DriftMonitor.chiSquareDrift(
      ref, docs.filter(pmod(col("doc_id"), lit(2)) === 1), Seq("source", "lang")))
    assert(streamed.nonEmpty && streamed == batch,
      "cumulative streamed report diverged from the batch statistic")

    // crash-replay of an applied batch id: fenced no-op, report intact
    val lastId = graft.streaming.IndexMaintenance.lastApplied(spark, state)
    assert(!graft.streaming.StreamingDrift.applyBatch(
      state, Seq("source", "lang"), curRows.toDF("source", "lang"), lastId))
    assert(rows(graft.streaming.StreamingDrift.report(spark, state)) == batch)
  }

  test("identical snapshots score zero everywhere") {
    import spark.implicits._
    val snap = (Seq.fill(7)("x") ++ Seq.fill(3)("y")).toDF("bucket")
    val out = DriftMonitor.chiSquareDrift(snap, snap, Seq("bucket"))
      .collect()
    assert(out.forall(r => r.getLong(5) == 0L && r.getString(6) == "ok"))
  }
}
