package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixture properties that shared oracles silently rely on.
  *
  * q8b (gaps-and-islands) breaks a session strictly when the gap EXCEEDS
  * 30 minutes, while q8c's native `session_window` is half-open
  * [ts, ts+gap) and starts a new session AT an exactly-30-minute gap.
  * The two queries share one DuckDB oracle, which is only correct while
  * no user has consecutive events exactly 30 minutes apart. That held by
  * inspection of the seed-42 fixtures; this spec makes it a hard gate so
  * a regenerated events fixture cannot silently turn the shared oracle
  * into a false pass/mismatch (round-4 ADVICE item).
  */
class FixtureContractSpec extends AnyFunSuite with SharedSpark {

  private val GapMicros = 30L * 60L * 1000000L

  /** The round-9 drift class, made a named gate: the events `ts`
    * column's parquet annotation must be one of the shapes
    * [[graft.Tables.events]] has a normalization arm for, and the
    * normalized frame must surface `TimestampType`. A regenerated
    * fixture with a new annotation fails HERE, naming the annotation —
    * not three queries later with a cast error (round 9 lost 6 queries
    * + 11 tests to exactly that).
    */
  private def checkEventsTsContract(dir: String): Unit = {
    val (phys, ann) =
      graft.util.ParquetFooter.columnType(spark, s"$dir/events.parquet", "ts")
    assert(graft.util.ParquetFooter.isKnownEventsTsShape(phys, ann),
      s"events.ts annotation drifted to " +
        s"${graft.util.ParquetFooter.describe(phys, ann)} — known shapes are " +
        "INT64/TIMESTAMP(NANOS) and INT64/TIMESTAMP(MICROS); Tables.events " +
        "and EventStream.readEvents need a new normalization arm")
    val normalized = Tables.events(spark, dir).schema("ts").dataType
    assert(normalized == org.apache.spark.sql.types.TimestampType,
      s"Tables.events left ts as $normalized for annotation " +
        graft.util.ParquetFooter.describe(phys, ann))
  }

  for (dir <- Seq(Sf0001, Sf001, "/root/testdata/sf0.1")
       if new java.io.File(dir).isDirectory) {
    test(s"events fixture at $dir has no exact-30-minute same-user gap") {
      val byUser = Window.partitionBy("user_id").orderBy("ts")
      val boundaryGaps = Tables(spark, dir, "events")
        .withColumn("prev_ts", lag("ts", 1).over(byUser))
        .filter(col("prev_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) === GapMicros)
        .count()
      assert(boundaryGaps === 0L,
        s"$boundaryGaps exact-30-min gaps: q8b and q8c may no longer share an oracle")
    }

    test(s"events fixture at $dir: ts annotation is a known shape " +
        "and normalizes to TimestampType") {
      checkEventsTsContract(dir)
    }
  }

  test("a mis-annotated events fixture fails the contract naming the annotation") {
    // bare INT64 with no logical annotation — the one shape that looks
    // like the nanosAsLong read result but carries no timestamp
    // semantics at all; no normalization arm exists and none should be
    // guessed at
    val base = java.nio.file.Files
      .createTempDirectory("graft-misannotated-events").toString
    import spark.implicits._
    Seq((1L, 1700000000000000L, 7L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val failure = intercept[org.scalatest.exceptions.TestFailedException] {
      checkEventsTsContract(base)
    }
    assert(failure.getMessage.contains("INT64"), failure.getMessage)
    assert(failure.getMessage.contains("no logical annotation"), failure.getMessage)
  }
}
