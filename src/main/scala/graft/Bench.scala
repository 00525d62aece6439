package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Materializes every headline query through the
  * noop datasource (full column evaluation, no driver collect, nothing for
  * Catalyst to prune under a bare `.count()`), prints ONE JSON line.
  *
  * Headline set = all declared queries except the deliberately-quadratic /
  * single-partition exact verifiers (q14 all-pairs n-gram Jaccard, q20
  * all-pairs cosine, q69 global-ntile z-order) — those exist as correctness
  * oracles for the production paths (q15/q25/q69b), which are benched here.
  *
  * Noise defense (a round-5 stall published 5 phantom regressions): each
  * query runs twice and reports the min; if the min exceeds 3× its standing
  * baseline (tools/bench_baseline.json, written with BASELINE.md) or the two
  * runs disagree by >2.5×, a third run is taken. Queries still over 3×
  * baseline after the retry are listed under "suspect" instead of being
  * silently published as regressions.
  *
  * Build-vs-query visibility: the first invocation of a query that
  * constructs a memoized artifact (q15's verified-pair cache, q38's LSH
  * index, q39's IVF index, q51's bucketed tables) is timed separately into
  * "builds" — the headline number for those queries is the WARM min, i.e.
  * the steady-state read against the persisted artifact, which is the
  * production shape (build once, query many). A build regression shows in
  * "builds" without polluting query timings.
  */
object Bench {

  /** Queries whose first invocation pays a one-time artifact build, and
    * the build's name in the "builds" map. q32/q41/q60 reuse q15's pair
    * cache / signatures and run after it alphabetically, so q15's cold
    * run is the one that prices the LSH collision-join machinery.
    */
  private val builders = Map(
    "q15_minhash_neardup" -> "pair_cache",
    "q38_ann_index_topk" -> "lsh_index",
    "q39_ivf_topk" -> "ivf_index",
    "q51_bucketed_join" -> "bucketed_tables",
    "q73_lexical_index_topk" -> "lexical_index",
    "q85_ivf_upsert" -> "ivf_upsert",
    "q89_lex_upsert" -> "lex_upsert")

  /** Optional standing per-query baseline (name → seconds), maintained
    * alongside BASELINE.md; absence just disables the 3×-of-baseline
    * retry trigger (the spread trigger still applies).
    */
  private def loadBaseline(): Map[String, Double] = {
    val f = new java.io.File("tools/bench_baseline.json")
    if (!f.exists()) return Map.empty
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      """"([^"]+)"\s*:\s*([0-9.eE+-]+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM before timing: JIT + codegen compilation otherwise
    // lands entirely on whichever query runs first and distorts its
    // number by several seconds.
    try {
      spark.range(1000000).selectExpr("sum(id)").write
        .format("noop").mode("overwrite").save()
      Tables(spark, sfDir, "documents").limit(100)
        .select(graft.functions.hash_embed(org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.lit(16)))
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    val excluded = Set("q14_ngram_jaccard", "q20_cosine_neardup",
      "q69_zorder_layout")
    val baseline = loadBaseline()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val suspects = scala.collection.mutable.ArrayBuffer[String]()
    val builds = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = SparkEntry.queries.toSeq
      .filterNot { case (name, _) => excluded(name) }
      .sortBy(_._1)
      .flatMap { case (name, fn) =>
        try {
          def once(): Double = {
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          // cold first run of a builder query = artifact build + query;
          // headline min is then taken over warm runs only
          builders.get(name).foreach(b => builds += b -> once())
          val times = scala.collection.mutable.ArrayBuffer(once(), once())
          def min = times.min
          val over3x = baseline.get(name).exists(b => min > 3 * b)
          if (over3x || times.max > 2.5 * min) times += once()
          if (baseline.get(name).exists(b => times.min > 3 * b))
            suspects += name
          Some(name -> times.min)
        } catch {
          case e: Throwable =>
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName)
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def numMap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => s"\"${esc(k)}\":$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"${esc(k)}\":\"${esc(v)}\"" }
      .mkString("{", ",", "}")
    val suspectJson = suspects.map(s => s"\"${esc(s)}\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${numMap(results)},"builds":${numMap(builds.toSeq)},"suspect":$suspectJson,"errors":$errJson,"sf":"$sfDir"}""")
    // caller-owned persist lifecycle: release the session-shared dedup
    // caches (minhash signatures + verified pairs) before stopping
    graft.pipeline.Dedup.unpersistSigs(spark, sfDir)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
