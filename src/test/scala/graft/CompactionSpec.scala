package graft

import graft.util.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite with SharedSpark {

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"compact-$tag").toString + "/data"

  test("partitioned appends compact to few files; data and pruning survive") {
    import spark.implicits._
    val dir = tempDir("bucketed")
    // simulate 12 micro-batch appends into a bucketed index layout
    (0 until 12).foreach { b =>
      (0 until 200).map(i => (b * 200L + i, s"row_${b}_$i"))
        .toDF("id", "payload")
        .withColumn("__bucket", pmod(hash(col("id")), lit(8)))
        .repartition(4)
        .write.mode("append").partitionBy("__bucket").parquet(dir)
    }
    val expected = spark.read.parquet(dir)
      .select("id", "payload", "__bucket")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

    val report = Compaction.compact(spark, dir, Seq("__bucket"))
    assert(report.rows == 2400L)
    assert(report.filesAfter < report.filesBefore,
      s"no reduction: ${report.filesBefore} -> ${report.filesAfter}")
    // one file per populated partition directory (2400 rows << max)
    assert(report.filesAfter <= 8, s"expected <=8 files, got ${report.filesAfter}")

    val after = spark.read.parquet(dir)
    assert(after.select("id", "payload", "__bucket").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet == expected)
    // partition pruning still works: a bucket filter reads a subset
    val pruned = after.filter(col("__bucket") === 3)
      .queryExecution.executedPlan.toString
    assert(pruned.contains("__bucket"), pruned.take(800))
  }

  test("flat layout compacts; maxRecordsPerFile re-splits large partitions") {
    import spark.implicits._
    val dir = tempDir("flat")
    (0 until 6).foreach { b =>
      (0 until 500).map(i => b * 500L + i).toDF("v")
        .repartition(5).write.mode("append").parquet(dir)
    }
    val report = Compaction.compact(spark, dir, maxRecordsPerFile = 1000L)
    assert(report.rows == 3000L)
    assert(report.filesAfter < report.filesBefore)
    assert(spark.read.parquet(dir).agg(sum("v")).head.getLong(0)
      == (0L until 3000L).sum)
  }

  test("a failed rewrite leaves the source untouched") {
    import spark.implicits._
    val dir = tempDir("guard")
    (0 until 100).map(_.toLong).toDF("v").write.parquet(dir)
    // nonexistent partition column -> the rewrite itself fails
    intercept[Exception] {
      Compaction.compact(spark, dir, Seq("no_such_col"))
    }
    assert(spark.read.parquet(dir).count() == 100L)
  }
}
