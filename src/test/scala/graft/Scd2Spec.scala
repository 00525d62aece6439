package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Scd2Spec extends AnyFunSuite with SharedSpark {

  test("q81 over the fixture: versions chain per user, one open row each") {
    val out = Queries.all("q81_scd2_history")(spark, Sf0001)
    // exactly one current (open-ended) version per user
    val perUser = out.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("open"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("nullto"))
    assert(perUser.filter(col("open") =!= 1 || col("nullto") =!= 1).isEmpty)
    // closed versions end no earlier than they start
    assert(out.filter(col("valid_to") < col("valid_from")).isEmpty)
  }

  test("consecutive identical values collapse into one version") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    // user 1: 10 -> 10 -> 20 -> 20 -> 10 must yield versions 10, 20, 10
    Seq(
      (0L, "2024-01-01 00:00:00", 1L, "view", 10.0, "{}"),
      (1L, "2024-01-01 01:00:00", 1L, "view", 10.0, "{}"),
      (2L, "2024-01-01 02:00:00", 1L, "view", 20.0, "{}"),
      (3L, "2024-01-01 03:00:00", 1L, "view", 20.0, "{}"),
      (4L, "2024-01-01 04:00:00", 1L, "view", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.pipeline.Events.q81Scd2(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (10.0, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
      (20.0, "2024-01-01 02:00:00", "2024-01-01 04:00:00"),
      (10.0, "2024-01-01 04:00:00", null)))
  }
}
