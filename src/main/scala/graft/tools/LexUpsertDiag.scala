package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables}
import graft.query.LexicalSearch

/** Diagnostic for the q89 `lex_upsert` build-time variance (round-10
  * verdict #2: clean-box builds ranged 3.7–8.2 s vs the 4.93 s
  * baseline). Runs the exact q89 build (buildIndex over doc_id%10!=0,
  * upsertIndex over the held-out tenth) N times against FRESH work
  * dirs in one JVM, timing the two phases separately. Prints one JSON
  * line per iteration; iteration 1 vs the rest isolates first-touch
  * codegen/JIT cost (the diagnosed cause — see BASELINE.md).
  */
object LexUpsertDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_DIAG_ITERS", "4").toInt
    val spark = Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm JIT/codegen the way Bench does
    spark.range(1000000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()

    def t(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }

    (1 to iters).foreach { i =>
      val work = s"${System.getProperty("java.io.tmpdir")}/graft_diag_lex_$i" +
        s"_${ProcessHandle.current().pid()}"
      val docs = Tables.parallelize(Tables(spark, sfDir, "documents"))
      val base = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val delta = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val tBuild = t(LexicalSearch.buildIndex(base, "doc_id", "text", work))
      val tUpsert = t(LexicalSearch.upsertIndex(spark, work, "doc_id", "text", delta))
      println(s"""{"iter":$i,"build":$tBuild,"upsert":$tUpsert}""")
      rm(new java.io.File(work))
    }
    spark.stop()
  }
}
