package graft

import graft.pipeline._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stages compose: the end-to-end curation run a training-data
  * team would actually execute — exact dedup → near-dup clean →
  * decontaminate → quality gates → leakage-safe split → shard
  * manifest — with conservation invariants between stages and
  * bit-identical reruns. Each stage is individually oracle-gated;
  * this spec pins that their CONTRACTS line up (id spaces, filters,
  * determinism), which no per-query oracle sees.
  */
class FullPipelineSpec extends AnyFunSuite with SharedSpark {

  test("curation chain: conservation, monotone shrinkage, rerun determinism") {
    val docs = Tables(spark, Sf0001, "documents")
    val total = docs.count()

    // 1. exact dedup: representatives absorb all copies
    val exact = Dedup.exact(spark, Sf0001)
    val nExact = exact.count()
    assert(exact.agg(sum("n_copies")).head.getLong(0) == total)

    // 2. near-dup clean (exact-first composition, q41)
    val clean = Dedup.cleanCorpus(spark, Sf0001)
    val nClean = clean.count()
    assert(nClean <= nExact)
    assert(clean.agg(sum("n_copies")).head.getLong(0) <= total)

    // 3. decontamination flags only train-split survivors
    val contaminated = Decontamination.contaminated(spark, Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(contaminated.forall(id =>
      id % Decontamination.EvalMod != Decontamination.EvalRem))

    // 4. quality gates: every gated id is a real doc id
    val gated = TextAnalysis.gopherGate(spark, Sf0001)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated.subsetOf(allIds) && gated.nonEmpty)

    // 5. survivors: cleaned representatives, uncontaminated, quality-passing
    val survivors = clean.select("doc_id").collect().map(_.getLong(0)).toSet
      .diff(contaminated).intersect(gated)
    assert(survivors.nonEmpty, "pipeline must keep something at fixture scale")

    // 6. leakage-safe split covers every doc exactly once
    val split = Dedup.q97LeakageSafeSplit(spark, Sf0001)
    assert(split.count() == total)
    assert(split.select("doc_id").distinct().count() == total)

    // 7. shard manifest partitions the full token mass
    val manifest = ScalableWindow.q96ShardManifest(spark, Sf0001)
    val docTokens = docs
      .agg(sum(size(org.apache.spark.sql.functions.split(
        trim(col("text")), "\\s+")).cast("long"))).head.getLong(0)
    assert(manifest.agg(sum("shard_tokens")).head.getLong(0) == docTokens)
    assert(manifest.agg(sum("n_docs")).head.getLong(0) == total)

    // 8. the whole chain is rerun-deterministic (hash-based decisions,
    // integer arithmetic — no rand(), no float accumulation order)
    val rerun = Dedup.cleanCorpus(spark, Sf0001).collect().toSeq
    assert(rerun == clean.collect().toSeq)
    val splitRerun = Dedup.q97LeakageSafeSplit(spark, Sf0001).collect().toSeq
    assert(splitRerun == split.collect().toSeq)

    Dedup.unpersistSigs(spark, Sf0001)
  }
}
