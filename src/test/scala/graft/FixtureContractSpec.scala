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
  }
}
