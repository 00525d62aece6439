package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared across the whole forked test JVM. */
object SharedSpark {
  lazy val session: SparkSession = {
    val s = Tables.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SharedSpark {
  lazy val spark: SparkSession = SharedSpark.session
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001 = "/root/testdata/sf0.01"
}
