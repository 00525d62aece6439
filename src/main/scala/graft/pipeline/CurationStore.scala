package graft.pipeline

import graft.Tables
import graft.util.PartitionedWrite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained CURATION-SIGNAL artifacts: the verified near-dup cluster
  * labels (q32) and frozen-LM quality scores (q94) that best-of-cluster
  * canonical selection (q100) and leakage-safe splitting (q97) consume.
  *
  * Recomputing those signals per run re-pays the corpus's most
  * expensive passes — the LSH collision join and the bigram-model
  * build — every time a downstream selection runs. This store applies
  * the discipline the IVF / lexical indexes already established
  * (build once, query many, append-maintain): `build` persists the
  * signals plus what incremental maintenance needs, `append` folds a
  * new document batch in WITHOUT rescanning the old corpus, and the
  * query faces ([[bestOfCluster]], [[leakageSafeSplit]]) are one
  * artifact-read join each.
  *
  * Layout under `workDir`:
  *   - `clusters/`  (node, label) — verified near-dup connected
  *     components, exactly q32's label frame (singletons implicit).
  *   - `scores/`    (doc_id, n_trans, sum_prob_ppm, avg_prob_ppm) —
  *     q94's exact-integer LM scores.
  *   - `docs/`      (doc_id, source) — the split-assignment universe.
  *   - `model/{unigrams,bigrams,vocab}` — the FROZEN add-one bigram
  *     model ([[TextAnalysis.q94LmQuality]]'s count frames), so
  *     appended documents are scored under the model the corpus was
  *     curated with (the production contract: the quality model is
  *     trained once and applied to each incoming batch; retraining
  *     per batch would silently re-rank already-curated documents).
  *   - `bands/` (partitioned by band-hash bucket) and `sigdocs/`
  *     (partitioned by id-hash bucket) — the near-dup probe index in
  *     the [[graft.streaming.StreamingNearDup]] layout, so an append
  *     probes only the partition directories its own bands hash into.
  *
  * 100 TB shape: `build` pays the corpus passes once; each `append`
  * costs O(batch) — its bands, its candidate buckets, its verified
  * pairs, one contracted-graph CC over (old labels ∪ batch ids)
  * touched by new edges — never a corpus rescan. Cluster-merge
  * correctness of the contraction: every old cluster is represented
  * by its label (= member minimum), so components over contracted
  * edges have the same minima as components over the full edge set,
  * and labels equal the full recompute's.
  */
object CurationStore {

  /** Partition-directory count for the probe index tables. */
  val IndexBuckets = 64

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new org.apache.hadoop.fs.Path(dir))

  /** Build the store from the corpus at `dir`. One LSH pass (shared
    * with the session pair cache), one LM pass, plus the probe-index
    * write.
    */
  def build(
      spark: SparkSession,
      dir: String,
      workDir: String,
      threshold: Double = 0.5): Unit = {
    val docsAll = Tables.parallelize(Tables(spark, dir, "documents"))
      .select(col("doc_id"), col("text"), col("source"))

    docsAll.select("doc_id", "source")
      .write.mode("overwrite").parquet(s"$workDir/docs")

    Dedup.connectedComponents(
        Dedup.verifiedNearDupPairs(spark, dir, threshold).select("d1", "d2"))
      .write.mode("overwrite").parquet(s"$workDir/clusters")

    // frozen model first, from ONE cached tokenization pass (the
    // regex tokenizer dominates these aggregations; uncached, each of
    // the three model writes re-tokenized the corpus)
    val toks = TextAnalysis.lmToks(docsAll)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val trans = TextAnalysis.lmTrans(toks)
      trans.groupBy("w1").agg(count(lit(1)).as("c1"))
        .write.mode("overwrite").parquet(s"$workDir/model/unigrams")
      trans.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .write.mode("overwrite").parquet(s"$workDir/model/bigrams")
      toks.select(explode(col("t")).as("w"))
        .agg(count_distinct(col("w")).as("vsz"))
        .write.mode("overwrite").parquet(s"$workDir/model/vocab")

      // corpus scores UNDER the just-persisted frozen model — the same
      // code path `append` scores with, and exact-equal to the per-run
      // q94 recompute because every corpus transition is in the model
      // (the left joins' unseen-coalesce branches never fire)
      scoreUnderModel(spark, toks, workDir)
        .write.mode("overwrite").parquet(s"$workDir/scores")
    } finally { toks.unpersist(); () }

    writeProbeIndex(docsAll.select("doc_id", "text"), spark, dir, workDir)
  }

  /** Score tokenized documents under the PERSISTED frozen model (left
    * joins + add-one smoothing: an unseen bigram scores
    * (0+1)·10^6 div (c1 + V), an unseen head token 10^6 div V — the
    * additive-smoothing contract). Shared by [[build]] (corpus pass)
    * and [[append]] (batch pass) so both score bit-identically.
    */
  private def scoreUnderModel(
      spark: SparkSession, toks: DataFrame, workDir: String): DataFrame = {
    val uni = spark.read.parquet(s"$workDir/model/unigrams")
    val bi = spark.read.parquet(s"$workDir/model/bigrams")
    val vocab = spark.read.parquet(s"$workDir/model/vocab")
    TextAnalysis.lmTrans(toks)
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__ppm",
        expr("(coalesce(c12, 0) + 1) * 1000000 div (coalesce(c1, 0) + vsz)"))
      .groupBy("doc_id")
      .agg(
        sum("m").cast("long").as("n_trans"),
        sum(col("m") * col("__ppm")).cast("long").as("sum_prob_ppm"))
      .withColumn("avg_prob_ppm", expr("sum_prob_ppm div n_trans"))
  }

  /** Probe-index rows for a document frame. Signatures come from the
    * session cache when `fromCorpus` names the built corpus (build
    * path — the sigs were just computed for the pair frame), else from
    * the kernel directly (append path).
    */
  private def writeProbeIndex(
      docs: DataFrame, spark: SparkSession, fromCorpus: String, workDir: String): Unit = {
    val sigs = Dedup.minhashSigs(spark, fromCorpus)
    Dedup.minhashBands(sigs)
      .withColumn("__bucket", pmod(hash(col("band"), col("bucket")), lit(IndexBuckets)))
      // bounded files/dir AND cluster-scaled write parallelism — see
      // graft.util.PartitionedWrite
      .transform(PartitionedWrite.spread(
        _, IndexBuckets, col("__bucket"), col("doc_id")))
      .write.mode("append").partitionBy("__bucket").parquet(s"$workDir/bands")
    sigs.join(docs, "doc_id")
      .select(col("doc_id"), col("sig"), col("text"))
      .withColumn("__sbucket", pmod(hash(col("doc_id")), lit(IndexBuckets)))
      .transform(PartitionedWrite.spread(
        _, IndexBuckets, col("__sbucket"), col("doc_id")))
      .write.mode("append").partitionBy("__sbucket").parquet(s"$workDir/sigdocs")
  }

  /** Fold a new batch (doc_id, text, source) into the store: score it
    * under the frozen model, discover its verified near-dup pairs —
    * in-batch, and against the corpus via the partition-pruned probe
    * index — merge cluster labels through the contracted graph, and
    * append the batch's own index rows. Ids must exceed all stored ids
    * (the ordered-feed contract the streaming operators share).
    */
  def append(
      spark: SparkSession,
      batch: DataFrame,
      workDir: String,
      threshold: Double = 0.5): Unit = {
    val docs = batch
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("source"))
      .localCheckpoint()

    docs.select("doc_id", "source")
      .write.mode("append").parquet(s"$workDir/docs")

    scoreUnderModel(spark, TextAnalysis.lmToks(docs), workDir)
      .write.mode("append").parquet(s"$workDir/scores")

    // ---- near-dup pairs of the batch ----
    val gramable = docs.filter(length(col("text")) >= Dedup.GramLen)
    // same one-pass kernel as the stored corpus signatures — estimator
    // comparisons across old/new sigs require bit-identical hashing
    val sigs = gramable.select(
        col("doc_id"),
        graft.functions.minhash_text(
          col("text"), lit(Dedup.GramLen), lit(Dedup.NumHashes)).as("sig"))
      .localCheckpoint()
    val newNew = Dedup.nearDupPairs(gramable.select("doc_id", "text"), sigs, threshold)
      .select("d1", "d2")
    val newOld = corpusPairs(spark, gramable, sigs, workDir, threshold)

    // ---- contracted-graph cluster merge ----
    val oldLabels = spark.read.parquet(s"$workDir/clusters").localCheckpoint()
    val contracted = newOld
      .join(oldLabels.withColumnRenamed("node", "d1"), Seq("d1"), "left")
      .select(coalesce(col("label"), col("d1")).as("d1"), col("d2"))
      .unionByName(newNew)
    val merged = Dedup.connectedComponents(contracted)
    val relabeledOld = oldLabels.as("o")
      .join(merged.as("m"), col("o.label") === col("m.node"), "left")
      .select(col("o.node"), coalesce(col("m.label"), col("o.label")).as("label"))
    // merged nodes not already labeled = batch docs + old singletons
    // drawn into a cluster by a new edge
    val newMembers = merged.join(oldLabels.select("node"), Seq("node"), "left_anti")
    val updated = relabeledOld.unionByName(newMembers).localCheckpoint()
    updated.write.mode("overwrite").parquet(s"$workDir/clusters")

    writeBatchProbeIndex(gramable, sigs, workDir)
  }

  private def writeBatchProbeIndex(
      docs: DataFrame, sigs: DataFrame, workDir: String): Unit = {
    Dedup.minhashBands(sigs)
      .withColumn("__bucket", pmod(hash(col("band"), col("bucket")), lit(IndexBuckets)))
      // bounded files/dir per batch, cluster-scaled parallelism
      .transform(PartitionedWrite.spread(
        _, IndexBuckets, col("__bucket"), col("doc_id")))
      .write.mode("append").partitionBy("__bucket").parquet(s"$workDir/bands")
    sigs.join(docs.select("doc_id", "text"), "doc_id")
      .select(col("doc_id"), col("sig"), col("text"))
      .withColumn("__sbucket", pmod(hash(col("doc_id")), lit(IndexBuckets)))
      .transform(PartitionedWrite.spread(
        _, IndexBuckets, col("__sbucket"), col("doc_id")))
      .write.mode("append").partitionBy("__sbucket").parquet(s"$workDir/sigdocs")
  }

  /** Verified (old, new) near-dup pairs of a batch against the stored
    * corpus — the [[graft.streaming.StreamingNearDup]] probe shape:
    * candidate generation reads only the partition directories the
    * batch's own bands hash into, estimator payloads only the candidate
    * ids' buckets, both id lists driver-bounded by [[IndexBuckets]];
    * batch-side occupancy is capped with logged drops.
    */
  private def corpusPairs(
      spark: SparkSession,
      docs: DataFrame,
      sigs: DataFrame,
      workDir: String,
      threshold: Double): DataFrame = {
    import spark.implicits._
    val empty = spark.emptyDataset[(Long, Long)].toDF("d1", "d2")
    if (!exists(spark, s"$workDir/bands")) return empty
    val bands = Dedup.minhashBands(sigs)
      .withColumn("__bucket", pmod(hash(col("band"), col("bucket")), lit(IndexBuckets)))
      .localCheckpoint()
    val probeBuckets = bands.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSeq // ≤ IndexBuckets: bounded
    val capped = graft.util.BucketGuard.capOccupancy(
      bands, Seq("band", "bucket"), Dedup.MaxBucketOccupancy, "curation append probe")
    val cand = spark.read.parquet(s"$workDir/bands")
      .filter(col("__bucket").isin(probeBuckets: _*))
      .select(col("doc_id").as("d1"), col("band"), col("bucket"))
      .join(capped.select(col("doc_id").as("d2"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      // ids increase batch over batch, so corpus ids are strictly
      // smaller; the guard keeps a replayed batch from self-matching
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
      .localCheckpoint()
    if (cand.isEmpty) return empty
    val sigBuckets = cand
      .select(pmod(hash(col("d1")), lit(IndexBuckets)).as("__sb"))
      .distinct().collect().map(_.getInt(0)).toSeq // bounded
    val oldSigDocs = spark.read.parquet(s"$workDir/sigdocs")
      .filter(col("__sbucket").isin(sigBuckets: _*))
    val estFloor = Dedup.estimatorFloor(threshold)
    val plausible = cand
      .join(oldSigDocs.select(col("doc_id").as("d1"), col("sig").as("s1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("s2")), "d2")
      .filter(graft.functions.sig_jaccard_est(col("s1"), col("s2")) >= estFloor)
      .select("d1", "d2")
    plausible
      .join(oldSigDocs.select(col("doc_id").as("d1"), col("text").as("t1")), "d1")
      .join(docs.select(col("doc_id").as("d2"), col("text").as("t2")), "d2")
      .withColumn("g1", Dedup.charGramsOf(col("t1")))
      .withColumn("g2", Dedup.charGramsOf(col("t2")))
      .withColumn("i", size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .withColumn("jac",
        col("i").cast("double") /
          (size(col("g1")).cast("long") + size(col("g2")).cast("long") - col("i")))
      .filter(col("jac") >= threshold)
      .select(col("d1"), col("d2"))
  }

  /** q100's output from the store: one artifact-read join + the same
    * composite-key agg — warm cost is the read cost, not the LSH + LM
    * recompute.
    */
  def bestOfCluster(spark: SparkSession, workDir: String): DataFrame = {
    val labels = spark.read.parquet(s"$workDir/clusters")
    val quality = spark.read.parquet(s"$workDir/scores")
      .select(col("doc_id"), col("avg_prob_ppm"))
    quality.join(labels, quality("doc_id") === labels("node"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"),
        col("avg_prob_ppm"))
      .groupBy("cluster_id")
      .agg(
        count(lit(1)).as("cluster_size"),
        max_by(col("doc_id"),
          col("avg_prob_ppm") * lit(1000000000L) - col("doc_id"))
          .as("kept_doc"),
        max(col("avg_prob_ppm")).as("kept_quality_ppm"))
      .orderBy("cluster_id")
  }

  /** q97's output from the store: cluster-consistent split assignment
    * over the stored document universe.
    */
  def leakageSafeSplit(spark: SparkSession, workDir: String): DataFrame = {
    val labels = spark.read.parquet(s"$workDir/clusters")
    val docs = spark.read.parquet(s"$workDir/docs")
    val bucket = Sampling.keepBucket(col("cluster_id"))
    docs.join(labels, docs("doc_id") === labels("node"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("split",
        when(bucket < 800, "train")
          .when(bucket < 900, "valid")
          .otherwise("test"))
      .orderBy("doc_id")
  }

  /** Compact the store's append-maintained tables
    * ([[graft.util.Compaction]]): each [[append]] lands files per
    * touched bucket in the probe index plus one file per batch in the
    * flat docs/scores tables. Partition layouts are preserved (pruned
    * probes unaffected); flat tables compact to well-sized files. Run
    * off the ingest path.
    */
  def compactStore(spark: SparkSession, workDir: String): Seq[graft.util.Compaction.Report] =
    Seq(
      (s"$workDir/bands", Seq("__bucket")),
      (s"$workDir/sigdocs", Seq("__sbucket")),
      (s"$workDir/docs", Seq.empty[String]),
      (s"$workDir/scores", Seq.empty[String])).collect {
      case (dir, pcols) if exists(spark, dir) =>
        graft.util.Compaction.compact(spark, dir, pcols)
    }
}
