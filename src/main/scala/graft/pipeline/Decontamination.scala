package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the standard training-corpus hygiene op
  * (e.g. GPT-3 appendix C; Dodge et al. 2021): flag training documents
  * that share any exact word n-gram with an evaluation/benchmark set so
  * they can be dropped before training. The reference has no notion of
  * this; it is part of the mandated LLM-data-pipeline surface.
  *
  * Scale design: each side materializes its DISTINCT per-doc n-grams
  * row-locally (array ops, no shuffle), then the candidate join runs on
  * the gram key. The eval side is structurally tiny (benchmarks are
  * thousands of docs against a 100 TB corpus), so it is explicitly
  * broadcast — the train side never shuffles; at full scale the gram
  * string would be replaced by a 64/128-bit hash (xxhash) to cut the
  * broadcast payload, with string re-verification of hash hits. The
  * fixture-scale query keeps raw grams so the DuckDB oracle is exact by
  * construction.
  */
object Decontamination {

  /** Contamination gram length. Published decontamination uses 8–13
    * WORD grams over natural text (vocabulary ~10⁵); the fixtures are
    * word salad over a ~40-word vocabulary, where a 4-gram already has
    * the collision statistics a much longer gram has in real text (40⁴
    * ≈ 2.6M possible grams vs ~5M corpus gram instances at sf0.01) —
    * long enough to be discriminative, short enough that the flagged
    * set is non-trivial. The length is a parameter; production corpora
    * would run 8–13.
    */
  val NGram = 4

  /** Deterministic pseudo-benchmark split of the fixture corpus:
    * doc_id % 20 == 7 plays the held-out eval set (5% of docs).
    */
  val EvalMod = 20L
  val EvalRem = 7L

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct word n-grams per document, space-joined. Guarded so docs
    * with fewer than n words yield an empty array (Spark `sequence`
    * descends on a negative span).
    */
  private[pipeline] def distinctWordGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))

  private def gramRows(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), explode(distinctWordGrams(tokens(col("text")), n)).as("gram"))

  /** Q63: contaminated training docs — every train-split document that
    * shares ≥1 exact word [[NGram]]-gram with the eval split, with the
    * count of distinct shared grams and of distinct eval docs touched.
    * A dedup pipeline drops (or flags) exactly these rows.
    */
  def contaminated(spark: SparkSession, dir: String, n: Int = NGram): DataFrame = {
    val docs = Tables.parallelize(Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("text"))
    val isEval = col("doc_id") % EvalMod === EvalRem
    val train = gramRows(docs.filter(!isEval), n)
    val eval_ = gramRows(docs.filter(isEval), n)
      .select(col("doc_id").as("eval_id"), col("gram"))
    train.join(broadcast(eval_), "gram")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** Q95: Bloom-prefiltered decontamination — [[contaminated]]'s scale
    * path when the eval gram set outgrows a raw broadcast (every
    * benchmark × paraphrases can reach 10⁸⁺ grams; raw strings are GBs,
    * Bloom bits are ~1.2 bytes/gram at 1% fpp). The eval grams fold
    * into a fixed-size Bloom filter executor-side (`stat.bloomFilter`
    * is a treeAggregate; the driver holds only the final bits), the
    * bits ship once per executor, and the train side is pre-filtered
    * SCAN-SIDE by [[graft.functions.BloomMightContain]] inside
    * whole-stage codegen — ~99% of train grams die before the shuffle.
    * The surviving candidates (true hits + ≤fpp false positives) then
    * run the exact verify join, so false positives are result-invisible
    * and the output provably equals q63's — the same
    * candidates-then-exact-verify contract as the LSH/IVF paths
    * (q25/q38/q39). Oracle: q63's, by construction.
    */
  def contaminatedBloom(
      spark: SparkSession, dir: String,
      n: Int = NGram, fpp: Double = 0.01): DataFrame = {
    val docs = Tables.parallelize(Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("text"))
    val isEval = col("doc_id") % EvalMod === EvalRem
    val train = gramRows(docs.filter(!isEval), n)
    val eval_ = gramRows(docs.filter(isEval), n)
      .select(col("doc_id").as("eval_id"), col("gram"))
    // expectedNumItems from a count over the (structurally tiny) eval
    // side only — never the corpus; undersizing only raises fpp, never
    // correctness, because of the exact verify below
    val expected = math.max(1000L, eval_.count())
    val bf = eval_.stat.bloomFilter("gram", expected, fpp)
    val bits = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val candidates =
      train.filter(graft.functions.bloom_might_contain(lit(bits), col("gram")))
    // no broadcast hint here, deliberately: this is the scale path for
    // exactly the case where the raw eval gram set is too large to ship
    // (the Bloom bits stand in for it) — forcing a broadcast would
    // reintroduce the OOM the filter exists to avoid. Post-Bloom the
    // candidate side is ~fpp of the corpus, so the planner's shuffle
    // (or AQE's runtime broadcast, when eval genuinely fits) is the
    // right call. q63's `contaminated` keeps the explicit hint as the
    // fixture-scale exact path.
    candidates.join(eval_, "gram")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")
  }
}
