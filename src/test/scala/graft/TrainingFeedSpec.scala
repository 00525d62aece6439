package graft

import graft.pipeline.Dedup
import graft.streaming.TrainingFeed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end spec of the COMPOSED streaming pipeline: ingest → exact
  * dedup → near-dup admission → quota gate → index maintenance as one
  * continuous chained query, with a query restart mid-feed and crash
  * replays of the final batch. The reference is the sequential fold of
  * the four stage contracts over arrival order.
  */
class TrainingFeedSpec extends AnyFunSuite with SharedSpark {

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"feed-$tag").toString

  private def sha256(t: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def wsTokens(t: String): Long = {
    val tt = t.trim
    if (tt.isEmpty) 0L else tt.split("\\s+").length.toLong
  }

  /** The feed: 200 fixture docs renumbered to sequential ids with 30
    * EXACT duplicates of earlier payloads injected mid-stream (the
    * fixture itself has no identical texts, so stage 1 needs them to
    * bite), then 40 more originals.
    */
  private lazy val feed: Seq[(Long, String, String)] = {
    val base = Tables(spark, Sf0001, "documents")
      .select("doc_id", "text", "source").orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val entries = base.take(160) ++
      base.slice(20, 50) ++ // exact duplicates, re-sent later
      base.slice(160, 200)
    entries.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
  }

  /** Sequential reference fold; returns (admitted rows with cum
    * tokens, exact-survivor count, near-dup-admitted ids).
    */
  private def reference(
      quotas: Map[String, Long]): (Seq[(Long, String, Long, Long)], Seq[Long], Seq[Long]) = {
    import spark.implicits._
    // stage 1: first occurrence per payload
    val seen = scala.collection.mutable.Set.empty[String]
    val fresh = feed.filter { case (_, t, _) => seen.add(sha256(t)) }
    // stage 2: greedy near-dup over the survivors, pair relation = the
    // engine's own exact-verified pairs (DedupEquivalenceSpec proves
    // them equal to all-pairs Jaccard)
    val freshDf = fresh.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= Dedup.GramLen)
    val sigs = freshDf.select(col("doc_id"),
      graft.functions.minhash_text(
        col("text"), lit(Dedup.GramLen), lit(Dedup.NumHashes)).as("sig"))
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    Dedup.nearDupPairs(freshDf, sigs, 0.5).collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
    }
    val ndAdmitted = scala.collection.mutable.LinkedHashSet.empty[Long]
    fresh.foreach { case (id, _, _) =>
      if (!adj.getOrElse(id, Seq.empty).exists(ndAdmitted)) ndAdmitted += id
    }
    // stage 3: per-source budget fold (every doc consumes)
    val consumed = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val admitted = fresh.filter(f => ndAdmitted(f._1)).flatMap { case (id, t, s) =>
      val n = wsTokens(t)
      consumed(s) += n
      if (consumed(s) <= quotas.getOrElse(s, 0L))
        Some((id, s, n, consumed(s)))
      else None
    }
    (admitted, fresh.map(_._1), ndAdmitted.toSeq)
  }

  test("chained stream with mid-feed restart equals the sequential fold; replays are no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // quotas at ~60% of each source's near-dup-admitted token mass so
    // the gate genuinely rejects
    val tokBySource = {
      val unlimited = feed.map(_._3).distinct.map(_ -> Long.MaxValue / 4).toMap
      val (_, _, nd) = reference(unlimited)
      val ndSet = nd.toSet
      feed.filter(f => ndSet(f._1))
        .groupBy(_._3).map { case (s, fs) => s -> fs.map(f => wsTokens(f._2)).sum }
    }
    val quotas = tokBySource.map { case (s, t) => s -> (t * 6 / 10) }
    val cfg = TrainingFeed.Config(quotas = quotas)
    val (wantAdmitted, wantFresh, wantNd) = reference(quotas)
    assert(wantFresh.size < feed.size, "exact dedup must bite")
    assert(wantNd.size < wantFresh.size, "near-dup admission must bite")
    assert(wantAdmitted.size < wantNd.size, "quota gate must bite")

    val work = tempDir("work"); val ckpt = tempDir("ckpt")
    // stage-0 observer: ingest-mix drift vs the full fixture's source
    // distribution, folded per batch alongside the admission chain
    val refMix = Tables(spark, Sf0001, "documents").select("source")
    TrainingFeed.enableDriftMonitor(refMix, work)
    val input = MemoryStream[(Long, String, String)]
    val stream = input.toDS().toDF("doc_id", "text", "source")
    // two batches, then STOP the query (simulated shutdown), restart
    // from the same checkpoint, two more batches
    val q1 = TrainingFeed.start(stream, work, ckpt, cfg)
    try {
      input.addData(feed.take(90))
      q1.processAllAvailable()
      input.addData(feed.slice(90, 170))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = TrainingFeed.start(stream, work, ckpt, cfg)
    try {
      input.addData(feed.slice(170, 171))
      q2.processAllAvailable()
      input.addData(feed.drop(171))
      q2.processAllAvailable()
    } finally q2.stop()

    // admitted feed equals the fold: ids, sources, tokens, budgets
    def admittedNow() = TrainingFeed.admittedFeed(spark, work)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(admittedNow() == wantAdmitted.toSet)
    // no duplicate payloads anywhere past stage 1, and no quota breach
    val gated = spark.read.parquet(s"$work/gated")
    assert(gated.select("doc_id").distinct().count() == gated.count())
    val byId = feed.map(f => f._1 -> f._2).toMap
    val admittedTexts = admittedNow().toSeq.map(a => byId(a._1))
    assert(admittedTexts.distinct.size == admittedTexts.size)
    for ((s, cum) <- admittedNow().groupBy(_._2).map { case (s, rows) => s -> rows.map(_._4).max })
      assert(cum <= quotas(s), s"source $s over quota")

    // the maintained index holds exactly the admitted ids, and its
    // answers equal a fresh batch build over the same vectors
    val indexed = spark.read.parquet(s"$work/index/cells")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(indexed == wantAdmitted.map(_._1).toSet)
    val vecs = feed.filter(f => indexed(f._1)).toDF("doc_id", "text", "source")
      .select(col("doc_id"),
        graft.functions.hash_embed(col("text"), lit(cfg.embedDim)).as("embedding"))
    val queries = vecs.limit(5)
      .select(col("doc_id").as("query_id"), col("embedding").as("qvec"))
    val fresh = tempDir("freshidx")
    graft.query.IvfIndex.build(vecs, "doc_id", "embedding", fresh,
      graft.query.IvfIndex.Params(nCentroids = cfg.nCentroids))
    def topk(path: String) = graft.query.IvfIndex
      .queryTopK(spark, path, "doc_id", "embedding", queries, "query_id", "qvec",
        k = 5, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(topk(s"$work/index") == topk(fresh))

    // fenced replay: re-running the last batch id is a complete no-op
    val lastBatch = feed.drop(171).toDF("doc_id", "text", "source")
    val cellsBefore = spark.read.parquet(s"$work/index/cells").count()
    val shaBefore = spark.read.parquet(s"$work/shas").count()
    TrainingFeed.step(lastBatch, 3L, work, cfg)
    assert(admittedNow() == wantAdmitted.toSet)
    assert(spark.read.parquet(s"$work/index/cells").count() == cellsBefore)
    assert(spark.read.parquet(s"$work/shas").count() == shaBefore)

    // crash replay INSIDE the fence window (chain fence lost after all
    // state writes): the guards — reused quota ledger, index fence,
    // self-match-proof probe — make the rerun converge to the same
    // state instead of double-counting or self-rejecting
    fs(work).delete(new org.apache.hadoop.fs.Path(s"$work/applied_batch"), true)
    TrainingFeed.step(lastBatch, 3L, work, cfg)
    assert(admittedNow() == wantAdmitted.toSet)
    assert(spark.read.parquet(s"$work/index/cells").count() == cellsBefore)

    // the drift observer saw every ARRIVING row exactly once (its own
    // fence absorbed both replay attempts above): the served report
    // equals the batch statistic over the whole feed vs the reference
    val wantDrift = graft.pipeline.DriftMonitor.chiSquareDrift(
        refMix, feed.toDF("doc_id", "text", "source").select("source"),
        Seq("source"))
      .collect().map(_.toSeq).toSet
    assert(TrainingFeed.driftReport(spark, work)
      .collect().map(_.toSeq).toSet == wantDrift)
  }

  test("CDC takedowns mid-feed: tagged deletes mask admitted docs out of " +
      "the maintained index inside the fence, the cadence compacts, " +
      "replays no-op") {
    import spark.implicits._
    val work = tempDir("cdc")
    val docs = feed.take(80)
    val byId = docs.map(d => d._1 -> d._2).toMap
    val quotas = docs.map(_._3).distinct.map(_ -> Long.MaxValue / 4).toMap
    val cfg = TrainingFeed.Config(quotas = quotas,
      opCol = Some("op"), compactDeletesEvery = Some(2L))
    def asDf(rows: Seq[(Option[String], Long, String, String)]) =
      rows.toDF("op", "doc_id", "text", "source")
    def cellIds() = spark.read.parquet(s"$work/index/cells")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // batch 0: every op NULL — the plain-insert CDC encoding must flow
    // through admission, not silently drop
    TrainingFeed.step(asDf(docs.take(40)
      .map(d => (Option.empty[String], d._1, d._2, d._3))), 0L, work, cfg)
    val indexed0 = cellIds()
    assert(indexed0.size > 10, "NULL-op rows were dropped from admission")
    val victims = indexed0.toSeq.sorted.take(3)

    // batch 1: new docs + takedowns of three admitted ids. Cadence not
    // due (1 % 2 != 0): the victims are MASKED, not yet folded
    TrainingFeed.step(asDf(
      docs.slice(40, 60).map(d => (Option("upsert"), d._1, d._2, d._3)) ++
        victims.map(v => (Option("delete"), v, "", ""))), 1L, work, cfg)
    assert(graft.query.Tombstones.exists(spark, s"$work/index"))
    // served retrieval excludes a victim immediately — probe with the
    // victim's own vector (its nearest neighbor by construction)
    val victimQueries = victims.map(v => (v, byId(v)))
      .toDF("query_id", "text")
      .select(col("query_id"),
        graft.functions.hash_embed(col("text"), lit(cfg.embedDim)).as("qvec"))
    val hitIds = graft.query.IvfIndex.queryTopK(spark, s"$work/index",
        "doc_id", "embedding", victimQueries, "query_id", "qvec",
        k = 3, threshold = -2.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hitIds.nonEmpty && victims.forall(!hitIds.contains(_)),
      "a taken-down doc still serves from the feed's index")

    // batch 2: cadence due — the fold-in retires the tombstones and
    // physically removes the victims
    TrainingFeed.step(asDf(
      docs.slice(60, 80).map(d => (Option("upsert"), d._1, d._2, d._3))),
      2L, work, cfg)
    assert(!graft.query.Tombstones.exists(spark, s"$work/index"))
    val live = cellIds()
    assert(victims.forall(!live.contains(_)))

    // equality pin: the maintained index answers like a fresh batch
    // build over exactly the surviving admitted vectors
    val vecs = docs.filter(d => live(d._1)).toDF("doc_id", "text", "source")
      .select(col("doc_id"),
        graft.functions.hash_embed(col("text"), lit(cfg.embedDim)).as("embedding"))
    val queries = vecs.limit(5)
      .select(col("doc_id").as("query_id"), col("embedding").as("qvec"))
    val fresh = tempDir("cdc-freshidx")
    graft.query.IvfIndex.build(vecs, "doc_id", "embedding", fresh,
      graft.query.IvfIndex.Params(nCentroids = cfg.nCentroids))
    def topk(path: String) = graft.query.IvfIndex
      .queryTopK(spark, path, "doc_id", "embedding", queries, "query_id",
        "qvec", k = 5, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(topk(s"$work/index") == topk(fresh))

    // the ledger never saw the delete rows: every gated doc id is
    // unique (the victims' admission rows from batch 0 stand alone —
    // budgets record what was spent)
    val gated = spark.read.parquet(s"$work/gated")
    assert(gated.select("doc_id").distinct().count() == gated.count())

    // fenced replay of the last batch id: complete no-op
    val before = live
    TrainingFeed.step(asDf(
      docs.slice(60, 80).map(d => (Option("upsert"), d._1, d._2, d._3))),
      2L, work, cfg)
    assert(cellIds() == before)
    // crash replay INSIDE the fence window (chain fence lost after all
    // state writes): the index's own fence keeps the fold a no-op
    fs(work).delete(new org.apache.hadoop.fs.Path(s"$work/applied_batch"), true)
    TrainingFeed.step(asDf(
      docs.slice(60, 80).map(d => (Option("upsert"), d._1, d._2, d._3))),
      2L, work, cfg)
    assert(cellIds() == before)
    assert(!graft.query.Tombstones.exists(spark, s"$work/index"))
  }

  test("health probe: per-batch retrieval metrics off the maintained index, replay-identical") {
    import spark.implicits._
    val work = tempDir("health")
    // splitCap exercises the feed's in-fence occupancy repair along
    // the way: splits are result-invisible, so every health/metric
    // assertion below must hold unchanged over the split index
    val cfg = TrainingFeed.Config(
      quotas = feed.map(_._3).distinct.map(_ -> Long.MaxValue / 4).toMap,
      splitCap = Some(8L))
    val docs = feed.take(60)
    val (b0, b1) = (docs.take(30), docs.drop(30))
    // probe set: 3 docs arriving in batch 0, 2 in batch 1 — each query
    // is its own doc's embedding, relevance = that doc (self-retrieval:
    // an indexed probe doc must surface at rank 1 with sim 1.0)
    val probeIds = Seq(2L, 7L, 11L, 31L, 44L)
    val probeQ = docs.filter(d => probeIds.contains(d._1))
      .toDF("doc_id", "text", "source")
      .select(col("doc_id").as("query_id"),
        graft.functions.hash_embed(col("text"), lit(cfg.embedDim)).as("qvec"))
    val rels = probeIds.map(i => (i, i)).toDF("query_id", "doc_id")
    TrainingFeed.enableHealthProbe(probeQ, rels, work, k = 3)

    TrainingFeed.step(b0.toDF("doc_id", "text", "source"), 0L, work, cfg)
    TrainingFeed.step(b1.toDF("doc_id", "text", "source"), 1L, work, cfg)

    val rep = TrainingFeed.healthReport(spark, work)
    assert(rep.select("batch").distinct().collect().map(_.getInt(0)).toSet
      == Set(0, 1))
    assert(rep.count() == 10L, "one metrics row per (batch, probe query)")

    // the in-fence occupancy repair held the cap (distinct fixture
    // texts → no degenerate cells to exempt)
    val maxOcc = spark.read.parquet(s"$work/index/cells")
      .groupBy("centroid_id").count()
      .agg(max(col("count"))).head.getLong(0)
    assert(maxOcc <= 8L, s"feed split cap not enforced: max occupancy $maxOcc")

    // batch-0 metrics: a probe doc ADMITTED in batch 0 self-retrieves
    // at rank 1; a probe doc that had not arrived yet scores zero hits
    val admitted0 = spark.read.parquet(s"$work/gated/batch=0")
      .filter(col("admitted")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val m0 = rep.filter(col("batch") === 0)
      .select(col("query_id").cast("long"), col("first_rel_rank"), col("hits_at_k"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    probeIds.foreach { q =>
      if (admitted0(q)) assert(m0(q) == ((1L, 1L)), s"query $q not rank-1 in batch 0")
      else assert(m0(q)._2 == 0L, s"unarrived doc $q scored a hit in batch 0")
    }

    // batch-1 metrics equal a DIRECT RetrievalEval over the maintained
    // index as it stands after batch 1 (the observer is just the wiring)
    val direct = graft.query.RetrievalEval.metrics(
      graft.query.IvfIndex.queryTopK(spark, s"$work/index", "doc_id", "embedding",
        probeQ, "query_id", "qvec", k = 3, threshold = -2.0),
      "query_id", "doc_id", "rn", rels, k = 3)
    def metricSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.select("query_id", "n_rel", "hits_at_k", "recall_micro", "success_at_k",
          "first_rel_rank", "mrr_micro", "dcg_nanos", "idcg_nanos", "ndcg_micro")
        .collect().map(_.toSeq).toSet
    val rep1 = metricSet(rep.filter(col("batch") === 1))
    assert(rep1 == metricSet(direct))

    // crash replay of the final batch (chain fence lost after all state
    // writes): metrics must come out IDENTICAL — the index fence pins
    // the index state and the per-batch partition is first-write-wins
    fs(work).delete(new org.apache.hadoop.fs.Path(s"$work/applied_batch"), true)
    TrainingFeed.step(b1.toDF("doc_id", "text", "source"), 1L, work, cfg)
    assert(metricSet(TrainingFeed.healthReport(spark, work)
      .filter(col("batch") === 1)) == rep1)
    // ... and even if the metrics partition itself was lost in the
    // crash, the replay recomputes the identical rows (same fenced
    // index, same fixed probe set)
    fs(work).delete(new org.apache.hadoop.fs.Path(s"$work/applied_batch"), true)
    fs(work).delete(new org.apache.hadoop.fs.Path(s"$work/health/metrics/batch=1"), true)
    TrainingFeed.step(b1.toDF("doc_id", "text", "source"), 1L, work, cfg)
    assert(metricSet(TrainingFeed.healthReport(spark, work)
      .filter(col("batch") === 1)) == rep1)
  }

  test("labeled health probe: filtered retrieval metrics (q108 shape), replay-identical") {
    import spark.implicits._
    val work = tempDir("health-lab")
    val cfg = TrainingFeed.Config(
      quotas = feed.map(_._3).distinct.map(_ -> Long.MaxValue / 4).toMap)
    val docs = feed.take(60)
    val (b0, b1) = (docs.take(30), docs.drop(30))
    // probes carry their own doc's source as the wanted label — the
    // q108 shape: retrieve among label-mates only
    val probeIds = Seq(2L, 7L, 11L, 31L, 44L)
    val probeQ = docs.filter(d => probeIds.contains(d._1))
      .toDF("doc_id", "text", "source")
      .select(col("doc_id").as("query_id"),
        graft.functions.hash_embed(col("text"), lit(cfg.embedDim)).as("qvec"),
        col("source").as("label"))
    val rels = probeIds.map(i => (i, i)).toDF("query_id", "doc_id")
    val labels = feed.toDF("doc_id", "text", "source")
      .select(col("doc_id"), col("source").as("label"))
    TrainingFeed.enableHealthProbe(probeQ, rels, work, k = 3,
      labels = Some(labels))

    TrainingFeed.step(b0.toDF("doc_id", "text", "source"), 0L, work, cfg)
    TrainingFeed.step(b1.toDF("doc_id", "text", "source"), 1L, work, cfg)

    // BOTH faces written every batch — the labeled probe is additive
    assert(TrainingFeed.healthReport(spark, work)
      .select("batch").distinct().collect().map(_.getInt(0)).toSet == Set(0, 1))
    val frep = TrainingFeed.filteredHealthReport(spark, work)
    assert(frep.select("batch").distinct().collect().map(_.getInt(0)).toSet
      == Set(0, 1))
    assert(frep.count() == 10L, "one filtered-metrics row per (batch, probe)")

    // batch-0: an admitted probe doc self-retrieves at rank 1 through
    // the FILTERED face too (it is its own label-mate); an unarrived
    // probe scores zero hits
    val admitted0 = spark.read.parquet(s"$work/gated/batch=0")
      .filter(col("admitted")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val m0 = frep.filter(col("batch") === 0)
      .select(col("query_id").cast("long"), col("first_rel_rank"), col("hits_at_k"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    probeIds.foreach { q =>
      if (admitted0(q))
        assert(m0(q) == ((1L, 1L)), s"probe $q not rank-1 in filtered batch 0")
      else assert(m0(q)._2 == 0L, s"unarrived probe $q hit in filtered batch 0")
    }

    // batch-1 filtered metrics equal a DIRECT filtered RetrievalEval
    // over the maintained index as it stands after batch 1
    def metricSet(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.select("query_id", "n_rel", "hits_at_k", "recall_micro", "success_at_k",
          "first_rel_rank", "mrr_micro", "dcg_nanos", "idcg_nanos", "ndcg_micro")
        .collect().map(_.toSeq).toSet
    val direct = graft.query.RetrievalEval.metrics(
      graft.query.IvfIndex.queryTopKFiltered(spark, s"$work/index",
        "doc_id", "embedding", probeQ, "query_id", "qvec",
        labels, "label", k = 3, threshold = -2.0),
      "query_id", "doc_id", "rn", rels, k = 3)
    val rep1 = metricSet(frep.filter(col("batch") === 1))
    assert(rep1 == metricSet(direct))

    // crash replay of the final batch: identical filtered metrics (the
    // index fence pins the index; the partition is first-write-wins)
    fs(work).delete(new org.apache.hadoop.fs.Path(s"$work/applied_batch"), true)
    TrainingFeed.step(b1.toDF("doc_id", "text", "source"), 1L, work, cfg)
    assert(metricSet(TrainingFeed.filteredHealthReport(spark, work)
      .filter(col("batch") === 1)) == rep1)
    // ... and a lost filtered partition is recomputed identically
    fs(work).delete(new org.apache.hadoop.fs.Path(s"$work/applied_batch"), true)
    fs(work).delete(
      new org.apache.hadoop.fs.Path(s"$work/health/metrics_filtered/batch=1"), true)
    TrainingFeed.step(b1.toDF("doc_id", "text", "source"), 1L, work, cfg)
    assert(metricSet(TrainingFeed.filteredHealthReport(spark, work)
      .filter(col("batch") === 1)) == rep1)
  }

  test("feed recluster cadence: the maintained index is rebuilt on schedule, answers unchanged") {
    import spark.implicits._
    val work = tempDir("reclu")
    val cfg = TrainingFeed.Config(
      quotas = feed.map(_._3).distinct.map(_ -> Long.MaxValue / 4).toMap,
      nCentroids = 4, reclusterEvery = Some(2L))
    val docs = feed.take(90)
    val (b0, b1, b2) = (docs.take(30), docs.slice(30, 60), docs.slice(60, 90))
    TrainingFeed.step(b0.toDF("doc_id", "text", "source"), 0L, work, cfg)
    TrainingFeed.step(b1.toDF("doc_id", "text", "source"), 1L, work, cfg)
    // batch 1 (1 % 2 != 0) only appended: some cell carries the build
    // file AND the upsert file
    def maxFiles(path: String): Long = graft.query.IvfIndex.stats(spark, path)
      .agg(max(col("n_files"))).head.getLong(0)
    val afterAppend = maxFiles(s"$work/index")
    assert(afterAppend >= 2L, "append did not leave a multi-file cell (test premise)")
    // batch 2 fires the cadence: the layout is a fresh build's again —
    // compared against an actual fresh build over the same admitted
    // corpus below (spread may write >1 file/cell even fresh, so "1"
    // is not the right constant; "same as fresh" is)
    TrainingFeed.step(b2.toDF("doc_id", "text", "source"), 2L, work, cfg)
    // retrieval off the re-clustered index equals a fresh build over
    // everything admitted (the restart test's equality pattern)
    val admitted = TrainingFeed.admittedFeed(spark, work).select("doc_id")
    val vecs = admitted
      .join(docs.toDF("doc_id", "text", "source"), "doc_id")
      .select(col("doc_id"),
        graft.functions.hash_embed(col("text"), lit(cfg.embedDim)).as("embedding"))
    val queries = vecs.limit(5)
      .select(col("doc_id").as("query_id"), col("embedding").as("qvec"))
    val fresh = tempDir("reclu-freshidx")
    graft.query.IvfIndex.build(vecs, "doc_id", "embedding", fresh,
      graft.query.IvfIndex.Params(nCentroids = cfg.nCentroids))
    def topk(path: String) = graft.query.IvfIndex
      .queryTopK(spark, path, "doc_id", "embedding", queries, "query_id", "qvec",
        k = 5, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(topk(s"$work/index") == topk(fresh))
    // the cadence really rewrote the layout: the maintained index's
    // file profile matches the fresh build's (deterministic spread
    // over an identical corpus), not the append-accumulated one
    assert(maxFiles(s"$work/index") == maxFiles(fresh),
      "cadence re-cluster did not rewrite the index layout")
    // a replayed batch id is a complete no-op (fence absorbs the cadence)
    val cellsBefore = spark.read.parquet(s"$work/index/cells").count()
    TrainingFeed.step(b2.toDF("doc_id", "text", "source"), 2L, work, cfg)
    assert(spark.read.parquet(s"$work/index/cells").count() == cellsBefore)
  }

  private def fs(dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
}
