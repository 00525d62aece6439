package graft.query

import graft.functions.cosine_sim
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index — the second scale path for similarity
  * search next to [[AnnIndex]]'s LSH: k-means coarse centroids over
  * L2-normalized vectors, index rows stored parquet-partitioned BY CELL,
  * plus one radius row per cell for the query-time completeness bound.
  *
  * Retrieval is EXACT, not recall-probabilistic: a query probes its
  * nearest cell(s), takes the running k-th best similarity as a floor,
  * and then probes only cells whose triangle-inequality bound says they
  * could still contribute — for any member x of cell c,
  * `d(q,x) >= d(q,centroid_c) - radius_c`, so on unit vectors
  * `sim(q,x) <= 1 - max(0, d(q,centroid_c) - radius_c)^2 / 2`. Cells
  * whose bound cannot beat the floor are skipped wholesale; every probed
  * candidate is ranked by the exact cosine kernel. On a clustered corpus
  * the bound prunes most cells; on an adversarially isotropic corpus it
  * degrades toward a full scan rather than silently dropping neighbors.
  *
  * 100 TB shape: the build is one KMeans fit + one assignment pass + a
  * partitioned write; the per-cell radius aggregation is one tiny
  * shuffle. A query batch reads only the cells that survive the bound —
  * the join on the `centroid_id` partition column prunes whole
  * directories at the source, which is the property LSH bucketing cannot
  * give a columnar store.
  */
object IvfIndex {

  /** maxIter=10: the coarse quantizer does not need tight convergence —
    * centroid quality only moves the probe count (the query bound is
    * exact for any centroid set), and each Lloyd iteration is a full
    * distributed pass over the fit input.
    */
  case class Params(
      nCentroids: Int = 16,
      maxIter: Int = 10,
      seed: Long = 42L)

  /** Fixed partition count + in-partition sort for the KMeans fit input.
    * The fit's tree aggregation sums floats in partition/row order, so
    * centroids (and the cell assignment of boundary vectors) would
    * otherwise depend on the session's core count — an index built at
    * local[4] must be bit-identical to one built at local[32] so that
    * probe-cost characteristics validated on one layout hold on another.
    * (Correctness never depends on this: the query-time bound is exact
    * for ANY centroid set.)
    */
  val BuildPartitions = 8

  /** Absorbs float-vs-double kernel noise when the stored radius is
    * reused at query time; padding only adds probes, never drops them.
    */
  private[query] val RadiusPad = 1e-6

  /** Per-query overfetch ceiling of the filtered fallback's refill
    * loop before it escalates to the direct label-equijoin ranking —
    * see [[filteredViaOverfetch]]. Past ~64k rows per query the top-k
    * heaps and hit frames grow toward corpus size, while the equijoin
    * alternative stays one flat labels pass.
    */
  private val RefillCap = 65536L

  /** Conservative serialized bytes per refill-loop hit row (query id +
    * id + sim + rn, all 8-byte, plus row overhead) — the a-priori size
    * estimate behind [[filteredViaOverfetch]]'s forced-broadcast gate.
    */
  private val HitRowBytes = 48L

  /** Fit centroids, assign every vector, persist model + cells (parquet
    * partitioned by centroid_id) + per-cell radii (the completeness
    * bound's data).
    */
  def build(
      df: DataFrame,
      idCol: String,
      embCol: String,
      outPath: String,
      params: Params = Params()): KMeansModel = {
    // a rebuild invalidates any persisted label metadata FIRST — its
    // freshness fingerprints cannot distinguish two same-shaped builds
    invalidateLabelMeta(df.sparkSession, outPath)
    // ... and retires any COMPOSED artifacts from a previous build at
    // this path: stale cell_codes would desync from the fresh cells,
    // and a stale enc_centers table would make [[IvfPq.isResidual]]
    // misread a later global re-encode as residual (wrong bounds,
    // silently wrong answers). A rebuild through this face yields a
    // clean plain-IVF index; [[IvfPq.build]] rewrites its own
    // artifacts right after.
    locally {
      val fs = new org.apache.hadoop.fs.Path(outPath)
        .getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      // tombstones too: a fresh build indexes exactly `df`, and a stale
      // delete log from a previous index at this path would silently
      // mask rows of the NEW corpus that happen to share ids
      Seq("cell_codes", "enc_centers", "enc_current", "codebooks",
          "split_pending", "_tmp_residuals", Tombstones.TableName)
        .foreach { t =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$outPath/$t"), true); ()
        }
    }
    val prep = AnnIndex.prepared(df, idCol, embCol)
      .repartition(BuildPartitions, col(idCol))
      .sortWithinPartitions(idCol)
      .persist()
    // MLlib KMeans requires 2 <= k <= n (random init samples centers
    // WITHOUT replacement): clamp so small corpora — a client's first
    // tiny ingest, a cold-start admission batch — build instead of
    // crashing in the aggregator. Fewer cells than asked only means
    // coarser pruning; the query bound stays exact.
    val n = prep.count()
    require(n >= 2,
      s"IvfIndex.build: need at least 2 vectors to build an index (got $n) " +
        "— brute-force SimilaritySearch serves degenerate corpora")
    val model = new KMeans()
      .setK(math.max(2L, math.min(params.nCentroids.toLong, n)).toInt)
      .setMaxIter(params.maxIter)
      .setSeed(params.seed)
      // seeded random init: k-means|| costs several extra distributed
      // passes per build for marginally better coarse cells — IVF only
      // needs a reasonable space partition (the query bound is exact for
      // any centroid set), and random init keeps the build one
      // iteration-loop of jobs
      .setInitMode("random")
      .setFeaturesCol("features")
      .setPredictionCol("centroid_id")
      .fit(prep)
    val assigned = model.transform(prep)
      .select(col(idCol), col(embCol), col("centroid_id"),
        org.apache.spark.ml.functions.vector_to_array(col("features"))
          .cast("array<float>").as("__norm"))
      .persist()
    try {
      assigned
        .select(col(idCol), col(embCol), col("centroid_id"))
        // bounded files/cell AND cluster-scaled write parallelism — see
        // graft.util.PartitionedWrite
        .transform(graft.util.PartitionedWrite.spread(
          _, params.nCentroids, col("centroid_id"), col(idCol)))
        .write.partitionBy("centroid_id").mode("overwrite")
        .parquet(s"$outPath/cells")
      // one tiny frame per index: each cell's centroid plus the max
      // distance of a member's normalized vector to it — the radius in
      // the query-time triangle bound. (The fitted MLlib model is NOT
      // persisted: retrieval needs only this, and the MLlib writer/reader
      // round-trip costs more jobs than the rest of the build.)
      assigned
        .join(broadcast(centersOf(df.sparkSession, model)), "centroid_id")
        .withColumn("d", sqrt(graft.functions.l2_dist_sq(col("__norm"), col("center"))))
        .groupBy("centroid_id")
        .agg(max(col("d")).as("radius"))
        .join(broadcast(centersOf(df.sparkSession, model)), "centroid_id")
        .select(col("centroid_id"), col("center"), col("radius"))
        .write.mode("overwrite").parquet(s"$outPath/cells_meta")
    } finally { assigned.unpersist(); prep.unpersist(); () }
    model
  }

  /** Full RE-CLUSTER with an atomic generation swap — the repair for
    * the one drift mode the log-structured lifecycle (append → split →
    * compact) cannot fix: a corpus whose distribution shifted until the
    * original centroid PLACEMENT is globally poor (every cell still
    * valid by the radius contract, but radii huge → probe counts
    * degrade toward a full scan). Fresh centroids/cells/meta are built
    * from the CURRENT corpus into a generation directory while readers
    * keep serving the old tables, then swapped in behind a marker
    * fence (the `split_pending` discipline):
    *
    *  - `_regen/` is built completely (cells, cells_meta, then a
    *    `_COMPLETE` sentinel — written LAST, so its presence proves
    *    the build finished);
    *  - the `recluster_pending` marker is written, the two live
    *    directories are renamed aside (`_retired_*`), the fresh ones
    *    renamed in, the retired generation and `_regen` are deleted,
    *    and the marker is removed LAST;
    *  - a crash ANYWHERE in that window leaves the marker, and
    *    [[ensureGeneration]] — one driver-side `fs.exists` at the head
    *    of every read/maintenance entry point when healthy — completes
    *    the swap deterministically (the sentinel says the build
    *    finished, so rolling forward is always safe; an artifact whose
    *    live directory is missing is restored from `_regen` or
    *    `_retired_*`, whichever still holds it). No reader ever sees a
    *    cells/cells_meta pair from two generations.
    *
    * Persisted label metadata is invalidated FIRST: its freshness
    * fingerprint (row count + cell id set) cannot distinguish two
    * same-shaped generations, so a swap could otherwise serve stale
    * per-label radii as fresh. Plain-IVF only — a composed index's
    * codes are priced against build-time structures; re-cluster it
    * with a full [[IvfPq.build]]. Result-invisible by the family
    * contract: the new generation indexes exactly the old one's rows,
    * and the query bound is exact for ANY centroid set (spec + q115
    * oracle-gated).
    */
  def recluster(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      params: Params = Params()): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(!fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/cell_codes")),
      "IvfIndex.recluster: this index carries a cell_codes table (a composed " +
        "IvfPq index) — its codes are priced against build-time structures; " +
        "re-cluster with IvfPq.build")
    // complete any crashed prior swap before starting a new one
    ensureGeneration(spark, indexPath)
    // stale-by-construction after the swap; delete while the old
    // generation is still live so a crash at any later point can never
    // leave an artifact whose fingerprint matches the NEW generation
    invalidateLabelMeta(spark, indexPath)
    val regen = s"$indexPath/_regen"
    fs.delete(new org.apache.hadoop.fs.Path(regen), true)
    // fresh build from the LIVE corpus: reads the OLD cells/ minus any
    // pending tombstones (a re-cluster is a full rebuild from current
    // rows, so it doubles as the complete physical compaction), writes
    // only under _regen/ — readers are untouched until the swap
    build(Tombstones.liveOnly(
        spark.read.parquet(s"$indexPath/cells"), spark, indexPath, idCol)
        .select(col(idCol), col(embCol)),
      idCol, embCol, regen, params)
    // the swap itself retires the (now spent) tombstone table: it is
    // in the non-installed-artifact purge list, so the marker-fenced
    // commit — and any crash replay of it — drops it atomically with
    // the generation change
    commitGeneration(spark, indexPath, Seq("cells", "cells_meta"))
  }

  private[query] def reclusterPendingPath(indexPath: String): String =
    s"$indexPath/recluster_pending"

  /** Every artifact name a generation swap may install or purge —
    * the superset [[commitGeneration]] deletes stale non-installed
    * members of (a residual→global composed re-cluster must remove
    * the old enc tables, or [[IvfPq.isResidual]] would misread the
    * fresh global codes as residual — wrong LUT pricing, silently
    * wrong answers). `split_pending` rides along: a fresh generation
    * has no in-flight split.
    */
  private val GenerationArtifacts = Seq(
    "cells", "cells_meta", "cell_codes", "codebooks",
    "enc_centers", "enc_current", "split_pending",
    // the delete log rides along like split_pending: a fresh
    // generation is built from LIVE rows only, so its tombstones are
    // spent — purging them INSIDE the marker-fenced swap (and its
    // crash replay) makes "new tables, no stale masks" atomic for
    // readers, with no separate clear step to crash between. The
    // lexical index's swap reuses this purge for its stats atomicity
    // (see LexicalSearch.compactTombstones).
    Tombstones.TableName)

  /** Commit a fully-built `_regen/` generation: sentinel, marker
    * (carrying the artifact list, so a crashed swap replays the SAME
    * plan), retire-then-install renames per artifact, purge of stale
    * non-installed generation artifacts, cleanup, marker removed
    * LAST. Shared by [[recluster]] and [[IvfPq.recluster]].
    */
  private[query] def commitGeneration(
      spark: SparkSession,
      indexPath: String,
      artifacts: Seq[String]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val regen = s"$indexPath/_regen"
    fs.create(p(s"$regen/_COMPLETE"), true).close()
    // marker written ATOMICALLY (temp + rename): a torn marker read
    // back as empty would replay the default cells/cells_meta plan
    // over a composed swap — fresh cells installed, stale codes kept,
    // silently wrong bounds. A crash before the rename leaves no
    // marker at all: the old generation stays live, _regen is an
    // orphan the next re-cluster deletes.
    val tmp = p(s"${reclusterPendingPath(indexPath)}._tmp")
    val m = fs.create(tmp, true)
    m.write(artifacts.mkString("\n").getBytes("UTF-8"))
    m.close()
    require(fs.rename(tmp, p(reclusterPendingPath(indexPath))),
      "recluster: could not publish the swap marker")
    artifacts.foreach { a =>
      // a mode-switching composed re-cluster can install an artifact
      // the old generation never had (global→residual mints enc
      // tables) — nothing to retire then
      if (fs.exists(p(s"$indexPath/$a")))
        require(fs.rename(p(s"$indexPath/$a"), p(s"$indexPath/_retired_$a")),
          s"recluster: could not retire $indexPath/$a")
    }
    artifacts.foreach { a =>
      require(fs.rename(p(s"$regen/$a"), p(s"$indexPath/$a")),
        s"recluster: could not install $regen/$a")
    }
    GenerationArtifacts.filterNot(artifacts.contains).foreach { a =>
      fs.delete(p(s"$indexPath/$a"), true); ()
    }
    (artifacts.map(a => s"$indexPath/_retired_$a") :+ regen)
      .foreach { d => fs.delete(p(d), true); () }
    // marker removed LAST: a crash during the cleanup above re-enters
    // ensureGeneration, which just finishes the deletes
    fs.delete(p(reclusterPendingPath(indexPath)), true)
    ()
  }

  /** Complete a crashed [[recluster]] swap — called at the head of
    * every read/maintenance entry point (one driver-side `fs.exists`
    * when healthy, the overwhelmingly common case). With the marker
    * present, the `_regen/_COMPLETE` sentinel proves the fresh
    * generation finished building (the marker is only ever written
    * after it), so the swap always rolls FORWARD: each live table
    * missing its directory is restored from `_regen` (not yet
    * installed) or is already installed; a live directory that still
    * coexists with its `_regen` copy is the OLD generation caught
    * before its retire-rename and is moved aside. Cleanup then deletes
    * the retired generation and the marker (marker last). Idempotent:
    * re-entry at any crash point converges to the fully-swapped state.
    */
  private[graft] def ensureGeneration(spark: SparkSession, indexPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val marker = p(reclusterPendingPath(indexPath))
    if (!fs.exists(marker)) return
    // the marker carries the swap's artifact list (written atomically
    // with the marker itself), so a crashed swap replays the same plan
    val artifacts = {
      val in = fs.open(marker)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val names = txt.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      if (names.nonEmpty) names else Seq("cells", "cells_meta")
    }
    val regen = s"$indexPath/_regen"
    artifacts.foreach { a =>
      val live = p(s"$indexPath/$a")
      val fresh = p(s"$regen/$a")
      val retired = p(s"$indexPath/_retired_$a")
      if (fs.exists(fresh)) {
        // fresh copy not yet installed: retire the old live first (the
        // crash hit between the marker write and this artifact's
        // renames), then install
        if (fs.exists(live)) {
          if (fs.exists(retired)) fs.delete(live, true) // unreachable; defensive
          else require(fs.rename(live, retired),
            s"ensureGeneration: could not retire $live")
        }
        require(fs.rename(fresh, live),
          s"ensureGeneration: could not install $fresh")
      } else if (!fs.exists(live) && fs.exists(retired)) {
        // fresh already consumed elsewhere or cleanup-crashed state
        // where this artifact never swapped: restore the old copy so
        // the SET stays single-generation (only reachable if _regen
        // was already deleted — i.e. every fresh table was installed —
        // so this branch restoring is the unreachable-defensive arm)
        require(fs.rename(retired, live),
          s"ensureGeneration: could not restore $retired")
      }
    }
    // purge stale non-installed generation artifacts (the mode-switch
    // story on [[commitGeneration]]), then retire/regen/marker cleanup
    GenerationArtifacts.filterNot(artifacts.contains).foreach { a =>
      fs.delete(p(s"$indexPath/$a"), true); ()
    }
    (artifacts.map(a => s"$indexPath/_retired_$a") :+ regen)
      .foreach { d => fs.delete(p(d), true); () }
    fs.delete(marker, true)
    ()
  }

  /** Incremental index maintenance: fold NEW vectors into a built index
    * without re-clustering. Each new vector is assigned to its nearest
    * existing centroid (one broadcast of the nCentroids-row metadata, no
    * KMeans fit) and appended to that cell's parquet partition; the
    * cell's stored radius grows to cover its new members.
    *
    * The exactness contract survives unconditionally: the query-time
    * triangle bound needs only "radius_c >= d(member, centroid_c) for
    * every member of c" — it never requires centroids to be the means of
    * their current members, so an index whose cells have drifted from
    * their centroids returns exactly the same top-k as a fresh build
    * over the union, just with more probes. Drift is a COST regression,
    * not a correctness one; re-cluster (full [[build]]) when probe
    * counts degrade, the same compact-when-it-pays discipline as any
    * log-structured index. At 100 TB this is the difference between a
    * nightly KMeans over the whole corpus and a per-batch append that
    * touches only the arriving rows plus one tiny metadata frame.
    *
    * Append-only contract: `newRows` ids must be disjoint from the ids
    * already indexed (the caller's dedup gate owns identity) and unique
    * WITHIN the batch. EXACT duplicate rows (same id, same embedding —
    * an at-least-once producer's retry) are collapsed here and benign;
    * a CONFLICTING duplicate (same id, different embedding) fails the
    * job naming the id (enforced in the assignment aggregation below)
    * — that is a data bug upstream, and indexing either pick would
    * silently serve wrong neighbors. An id repeated across batches
    * surfaces twice as a candidate — never silently dropped, but not
    * replaced either.
    */
  def upsert(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      newRows: DataFrame): Unit = {
    // a COMPOSED index must append through [[IvfPq.upsert]]: a
    // cells-only append would leave the new vectors with no code
    // rows, and the composed scan would silently never surface them
    val codesPath = new org.apache.hadoop.fs.Path(s"$indexPath/cell_codes")
    require(!codesPath.getFileSystem(spark.sessionState.newHadoopConf())
        .exists(codesPath),
      "IvfIndex.upsert: this index carries a cell_codes table (a composed " +
        "IvfPq index) — append through IvfPq.upsert so the codes land " +
        "with their cells")
    upsertCells(spark, indexPath, idCol, embCol, newRows)
  }

  /** [[upsert]]'s body without the composed-index guard — the cells
    * half of [[IvfPq.upsert]], which appends the matching code rows
    * itself.
    */
  private[query] def upsertCells(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      newRows: DataFrame): Unit = {
    ensureGeneration(spark, indexPath)
    // a tombstoned id must be physically purged (compactTombstones)
    // before it can be re-inserted — see [[Tombstones.requireNoOverlap]]
    Tombstones.requireNoOverlap(spark, indexPath, idCol, newRows,
      "IvfIndex.upsert")
    val cellMeta = spark.read.parquet(s"$indexPath/cells_meta")
    // nCentroids-row frame: count it once here, not per write below
    val nCells = cellMeta.count().toInt.max(1)
    // label-meta fold eligibility is decided BEFORE the append: an
    // artifact is foldable iff the batch carries its label column AND
    // the artifact is provably fresh w.r.t. the PRE-append index (the
    // same fingerprint check queries use — an artifact someone else
    // already staled cannot be "caught up" by a batch-sized merge,
    // because the rows that staled it are unknown here)
    val batchCols = newRows.columns.toSet
    val foldable = labelMetaArtifacts(spark, indexPath)
      .filter { case (lc, _, snapRows, snapCells) =>
        batchCols(lc) &&
          snapRows == spark.read.parquet(s"$indexPath/cells").count() &&
          snapCells == cellDirIds(spark, indexPath).sorted
      }
    val assigned = assignNew(cellMeta, nCells, idCol, embCol, newRows)
      .persist()
    try {
      assigned
        .select(col(idCol), col(embCol), col("centroid_id"))
        // bounded files/cell per append, cluster-scaled parallelism
        .transform(graft.util.PartitionedWrite.spread(
          _, nCells, col("centroid_id"), col(idCol)))
        .write.partitionBy("centroid_id").mode("append")
        .parquet(s"$indexPath/cells")
      // grow radii to cover the new members; localCheckpoint materializes
      // the updated frame BEFORE the overwrite of the path it was read
      // from (cells_meta is nCentroids rows — the checkpoint is trivial)
      val updated = cellMeta
        .join(
          assigned.groupBy("centroid_id").agg(max(col("d")).as("__new_r")),
          Seq("centroid_id"), "left")
        .select(col("centroid_id"), col("center"),
          greatest(col("radius"), coalesce(col("__new_r"), lit(0.0))).as("radius"))
        .localCheckpoint()
      updated.write.mode("overwrite").parquet(s"$indexPath/cells_meta")
      // maintain the filtered-search label metadata THROUGH the append
      // instead of letting it go stale: for each foldable artifact, the
      // batch's per-(cell, label) max distances merge into the persisted
      // radii (a batch-sized max-merge — radii only ever grow under an
      // append, so the merge is exact), and the snapshot advances to the
      // post-append fingerprints. q108-class queries then stay on the
      // cheap persisted path under continuous ingest ([[upsert]]-fed
      // maintenance included) with no manual [[buildLabelMeta]] rerun.
      if (foldable.nonEmpty)
        foldLabelMeta(spark, indexPath, idCol, assigned, newRows, foldable)
    } finally assigned.unpersist()
  }

  /** The persisted [[buildLabelMeta]] artifacts under `indexPath`:
    * (labelCol, basePath, snapshot rows, snapshot cell ids). One tiny
    * snapshot read per artifact; artifacts written before the
    * snapshot carried its label column are skipped (they can only be
    * rebuilt, never folded). An UNREADABLE snapshot (a crash
    * mid-overwrite in [[buildLabelMeta]] or [[foldLabelMeta]] leaves
    * an empty or partial directory) is skipped the same way — the
    * fail-safe the freshness contract asserts: a torn artifact must
    * degrade to non-foldable/stale, never wedge every subsequent
    * [[upsert]] with a read failure until manual cleanup.
    */
  private[query] def labelMetaArtifacts(
      spark: SparkSession,
      indexPath: String): Seq[(String, String, Long, Seq[Long])] = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("label_meta_"))
      .flatMap { s =>
        val base = s.getPath.toString
        val snapP = new org.apache.hadoop.fs.Path(s"$base/snapshot")
        if (!fs.exists(snapP)) None
        else scala.util.Try {
          val snap = spark.read.parquet(snapP.toString)
          if (!snap.columns.contains("label_col")) None
          else {
            val r = snap.head
            // getSeq, not getAs[Seq]: Spark hands back a mutable
            // ArraySeq that a cast to immutable Seq would CCE on
            Some((r.getAs[String]("label_col"), base,
              r.getAs[Long]("rows"),
              r.getSeq[Long](r.fieldIndex("cells")).toSeq))
          }
        }.toOption.flatten
      }
  }

  /** The batch-sized max-merge of [[upsertCells]]: fold the assigned
    * batch's per-(cell, label) max distances into each foldable
    * artifact's radii and advance its snapshot. The new snapshot is
    * derived ARITHMETICALLY from the pre-append snapshot plus this
    * batch (rows + batch count; cells ∪ batch cells) — never re-read
    * from the index — so a racing writer's rows make the real
    * fingerprints diverge from it and the artifact reads stale
    * (fail-safe), exactly the [[buildLabelMeta]] race discipline.
    *
    * Crash windows all degrade to the stale fallback, never to wrong
    * answers: a crash after the cells append but before the fold
    * leaves the old snapshot behind the grown row count (stale,
    * detected); between the radii overwrite and the snapshot write,
    * the merged radii sit under the old snapshot — still behind the
    * grown count, still stale; and mid-overwrite of either tiny file
    * is unreadable-or-old, both of which [[cachedLabelRadii]] treats
    * as absent/stale. The one state that reads FRESH is the fully
    * committed fold, whose radii are exact by the max-merge argument.
    */
  private def foldLabelMeta(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      assigned: DataFrame,
      newRows: DataFrame,
      artifacts: Seq[(String, String, Long, Seq[Long])]): Unit = {
    import spark.implicits._
    val batchN = assigned.count()
    // ≤ nCells ids (the probe-pruning collect bound)
    val batchCells = assigned.select(col("centroid_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSeq
    artifacts.foreach { case (lc, base, snapRows, snapCells) =>
      val old = spark.read.parquet(s"$base/radii")
      val cidT = old.schema("centroid_id").dataType
      // assignNew's `d` IS the member→centroid distance the radii
      // bound needs (same normalized-vector kernel as the build).
      // Null labels are dropped BEFORE the aggregation: buildLabelMeta
      // derives radii through an inner join on the labels frame, so a
      // built artifact never holds a (cell, null) row — folding one in
      // would diverge the two artifact shapes (harmless to answers, a
      // null never equi-matches, but it inflates the fanout count the
      // branch decision reads).
      val batchRadii = assigned
        .join(newRows.select(col(idCol), col(lc)), Seq(idCol))
        .filter(col(lc).isNotNull)
        .groupBy(col("centroid_id"), col(lc))
        .agg(max(col("d")).as("__new_rl"))
      val merged = old
        .withColumnRenamed("__rl", "__old_rl")
        .join(batchRadii, Seq("centroid_id", lc), "full")
        .select(col("centroid_id").cast(cidT).as("centroid_id"), col(lc),
          greatest(coalesce(col("__old_rl"), lit(0.0)),
            coalesce(col("__new_rl"), lit(0.0))).as("__rl"))
        .localCheckpoint() // materialized BEFORE overwriting its source
      merged.write.mode("overwrite").parquet(s"$base/radii")
      Seq((snapRows + batchN, (snapCells ++ batchCells).distinct.sorted, lc))
        .toDF("rows", "cells", "label_col")
        .repartition(1).write.mode("overwrite").parquet(s"$base/snapshot")
    }
  }

  /** Nearest-existing-centroid assignment of a new batch:
    * (idCol, embCol, centroid_id, d) — the shared front half of
    * [[upsert]] and [[IvfPq.upsert]]'s code append. Enforces the
    * append-only contract (conflicting duplicate batch ids fail
    * loudly); exact duplicate rows collapse.
    */
  private[query] def assignNew(
      cellMeta: DataFrame,
      nCells: Int,
      idCol: String,
      embCol: String,
      newRows: DataFrame): DataFrame = {
    val prep = AnnIndex.prepared(
      newRows.dropDuplicates(Seq(idCol, embCol)), idCol, embCol)
      .select(col(idCol), col(embCol),
        org.apache.spark.ml.functions.vector_to_array(col("features"))
          .cast("array<float>").as("__norm"))
    // nearest existing centroid by the assignment metric (Euclidean on
    // the normalized vector — the same metric build's KMeans assigned
    // with), ties to the lower centroid id. Argmin as a k=1 topk_by on
    // NEGATED distance ((-d) desc == d asc, ties id asc — the window's
    // exact order): the map-side partial collapses each task to one row
    // per batch id instead of shuffling the batch × nCentroids frame;
    // embCol is unique per id, so first() is deterministic here
    prep.crossJoin(broadcast(cellMeta))
      .withColumn("d", sqrt(graft.functions.l2_dist_sq(col("__norm"), col("center"))))
      .groupBy(col(idCol))
      .agg(
        graft.functions.topk_by(col("centroid_id"), -col("d"), lit(1)).as("__t"),
        first(col(embCol)).as(embCol),
        count(lit(1)).as("__nrows"))
      // the unique-id contract above is ENFORCED, not assumed: under a
      // duplicated batch id, first(embCol) could pair one duplicate's
      // embedding with the other's argmin centroid. Exact duplicates
      // were collapsed above, so each surviving id contributes exactly
      // nCells rows to this aggregation (the cross join); any other
      // count proves a CONFLICTING duplicate (same id, different
      // embedding) — assert_true inside the filter fails the job
      // naming the id, at zero extra jobs
      .filter(assert_true(col("__nrows") === nCells,
        concat(lit("IvfIndex.upsert: newRows contains a duplicated id ("),
          col(idCol).cast("string"),
          lit(") with conflicting embeddings — the append-only contract " +
            "requires one embedding per batch id"))).isNull)
      .select(col(idCol), col(embCol),
        col("__t").getItem(0).getField("id").as("centroid_id"),
        (-col("__t").getItem(0).getField("score")).as("d"))
  }

  /** Compact the append-maintained cells table
    * ([[graft.util.Compaction]]): every [[upsert]] lands files per
    * touched cell, so at batch cadence the index decays into small
    * files whose open/footer cost dominates probes. The centroid_id
    * partition layout is preserved — the static `isin` partition
    * pruning keeps pruning exactly as before. Run off the query path.
    */
  def compactIndex(spark: SparkSession, indexPath: String): graft.util.Compaction.Report =
    graft.util.Compaction.compact(spark, s"$indexPath/cells", Seq("centroid_id"))

  /** Mark `ids` DELETED — the O(batch) half of row removal (see
    * [[Tombstones]] for the design and the exactness argument). Every
    * query path masks tombstoned rows from its earliest candidate scan
    * from this call on; physical removal is [[compactTombstones]]'s
    * job, off the query path. Works unchanged on a composed ([[IvfPq]])
    * index — the tombstone masks the code row and the payload row
    * alike, and the composed compaction rewrites both.
    *
    * Persisted label metadata stays SERVED, deliberately: per-(cell,
    * label) radii are maxima over member sets and deletion only
    * shrinks the set, so the artifact's bounds remain valid (merely
    * less tight) — the exact mirror of the upsert fold's
    * radii-only-grow argument. The per-label fanout counts it carries
    * over-count by the tombstoned rows until compaction, which is a
    * routing-cost skew, never a correctness one.
    */
  def delete(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      ids: DataFrame): Unit = {
    ensureGeneration(spark, indexPath)
    Tombstones.append(spark, indexPath, idCol, ids)
  }

  /** What a [[compactTombstones]] pass did: which cells were rewritten,
    * how many rows left, which cells emptied out entirely (directory
    * and meta row dropped).
    */
  case class DeleteCompactionReport(
      rewrittenCells: Seq[Long],
      rowsRemoved: Long,
      emptiedCells: Seq[Long])

  /** Fold pending deletes into the physical layout — the batched,
    * off-query-path half of row removal. Rewrites ONLY the cell
    * directories that actually hold tombstoned rows (a composed
    * index's matching `cell_codes` directories move in the same pass),
    * re-tightens the rewritten cells' radii from their surviving
    * members (centers unchanged — survivors were assigned against
    * them; a radius over fewer members can only shrink, and a tighter
    * radius only removes probes), drops cells emptied entirely, and
    * clears the tombstone table LAST.
    *
    * Crash story — no marker needed: the tombstone table IS the
    * marker. Every rewrite strictly removes rows that every read is
    * already masking, so a crash at ANY point leaves reads exact and
    * the rerun idempotent (cells already rewritten simply match no
    * tombstone the second time). Only after all physical work commits
    * is the table dropped. The mid-write kill window of the dynamic
    * partition overwrite is the same accepted residual as
    * [[splitHotCells]]'s, with a strictly better failure mode: the
    * masking table outlives it.
    *
    * Scale shape: one partition-pruned semi-join finds the affected
    * cells (≤ nCentroids ids reach the driver — the probe-pruning
    * collect pattern), and every subsequent scan is pruned to those
    * directories; untouched cells are never read.
    */
  def compactTombstones(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String): DeleteCompactionReport = {
    ensureGeneration(spark, indexPath)
    // a crashed composed split may have left code directories
    // inconsistent with cells — reconcile before rewriting either
    repairPendingCodes(spark, indexPath, idCol)
    val tombs = Tombstones.df(spark, indexPath) match {
      case None => return DeleteCompactionReport(Nil, 0L, Nil)
      case Some(t) => t.distinct().localCheckpoint()
    }
    val hasCodes = {
      val p = new org.apache.hadoop.fs.Path(s"$indexPath/cell_codes")
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val tombIds = tombs.select(col(Tombstones.IdColumn).as(idCol))
    val cells = spark.read.parquet(s"$indexPath/cells")
    // which cells hold a tombstoned row: one semi-join per table, ≤
    // nCentroids ids to the driver. The CODES side is checked too —
    // a rerun after a crash between the cells rewrite and the codes
    // rewrite sees clean cells but still-dirty codes, and deciding
    // from cells alone would clear the table with deleted code rows
    // left to poison composed floors
    def dirtyCells(t: DataFrame): Seq[Long] =
      t.join(tombIds, Seq(idCol), "left_semi")
        .select(col("centroid_id").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSeq
    val affected = (dirtyCells(cells) ++ (if (!hasCodes) Nil
      else dirtyCells(spark.read.parquet(s"$indexPath/cell_codes"))))
      .distinct.sorted
    if (affected.isEmpty) {
      // every tombstoned id is absent from the index (double-delete
      // after a compaction, or a delete of unknown ids): nothing to
      // rewrite, just retire the table
      Tombstones.clear(spark, indexPath)
      return DeleteCompactionReport(Nil, 0L, Nil)
    }
    // survivors of the affected cells — checkpointed once: this frame
    // feeds the rewrite, the radius recompute AND the removed-row
    // tally, and the rewrite overwrites the directories it was read
    // from (the splitHotCells discipline)
    val survivors = cells
      .filter(col("centroid_id").isin(affected: _*))
      .join(tombIds, Seq(idCol), "left_anti")
      .select(col(idCol), col(embCol), col("centroid_id"))
      .localCheckpoint()
    val before = cells.filter(col("centroid_id").isin(affected: _*)).count()
    val after = survivors.count()

    // composed index: the affected cells' surviving CODE rows,
    // checkpointed before their source directories are overwritten
    val codeSurvivors = if (!hasCodes) None else Some {
      spark.read.parquet(s"$indexPath/cell_codes")
        .filter(col("centroid_id").isin(affected: _*))
        .join(tombIds, Seq(idCol), "left_anti")
        .localCheckpoint()
    }

    // rewrite the affected cell directories to their survivors
    survivors
      .transform(graft.util.PartitionedWrite.spread(
        _, affected.size, col("centroid_id"), col(idCol)))
      .write.partitionBy("centroid_id").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$indexPath/cells")
    codeSurvivors.foreach { cs =>
      val dataCols = cs.columns.filterNot(_ == "centroid_id").map(col).toSeq
      cs.select(dataCols :+ col("centroid_id"): _*)
        .transform(graft.util.PartitionedWrite.spread(
          _, affected.size, col("centroid_id"), col(idCol)))
        .write.partitionBy("centroid_id").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$indexPath/cell_codes")
    }
    // dynamic overwrite cannot EMPTY a partition — cells whose every
    // member was deleted keep their stale directory unless dropped
    // explicitly (≤ affected ids at the driver). Their meta rows (and
    // a composed index's code directories) go with them.
    val keptIds = survivors.select(col("centroid_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    val emptied = affected.filterNot(keptIds)
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    emptied.foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$indexPath/cells/centroid_id=$c"), true)
      if (hasCodes)
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$indexPath/cell_codes/centroid_id=$c"), true)
      ()
    }
    // re-tighten the rewritten cells' radii from their survivors:
    // centers unchanged, max distance over a subset only shrinks —
    // deletes are the one lifecycle event where bounds IMPROVE
    val cellMeta = spark.read.parquet(s"$indexPath/cells_meta")
    val normalized = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("__raw").setOutputCol("__f").setP(2.0)
      .transform(survivors.withColumn("__raw",
        org.apache.spark.ml.functions.array_to_vector(
          col(embCol).cast("array<double>"))))
      .select(col("centroid_id"),
        org.apache.spark.ml.functions.vector_to_array(col("__f"))
          .cast("array<float>").as("__norm"))
    val tightened = normalized
      .join(broadcast(cellMeta.select(col("centroid_id"), col("center"))),
        "centroid_id")
      .withColumn("d", sqrt(graft.functions.l2_dist_sq(col("__norm"), col("center"))))
      .groupBy("centroid_id")
      .agg(max(col("d")).as("__r"))
    val updatedMeta = cellMeta
      .filter(!col("centroid_id").isin(emptied: _*))
      .join(tightened, Seq("centroid_id"), "left")
      .select(col("centroid_id"), col("center"),
        coalesce(col("__r"), col("radius")).as("radius"))
      .localCheckpoint()
    updatedMeta.write.mode("overwrite").parquet(s"$indexPath/cells_meta")
    // the table is the crash marker — dropped LAST, when every rewrite
    // above is committed. (Persisted label metadata self-stales via
    // its row-count fingerprint now that the counts changed.)
    Tombstones.clear(spark, indexPath)
    DeleteCompactionReport(affected, before - after, emptied)
  }

  /** [[splitHotCells]] looped to convergence: a mean-threshold split
    * is not guaranteed balanced, so one pass can leave a side
    * over-cap; each pass strictly shrinks every split cell (both
    * sides non-empty), so the loop terminates at "every cell ≤ cap or
    * all-identical (degenerate, reported and exempt)". The shared
    * occupancy-repair step of the maintenance faces.
    */
  def splitToConvergence(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      occupancyCap: Long): Unit = {
    var r = splitHotCells(spark, indexPath, idCol, embCol, occupancyCap)
    while (r.split.nonEmpty)
      r = splitHotCells(spark, indexPath, idCol, embCol, occupancyCap)
  }

  /** Maintenance diagnostics: one row per cell — (centroid_id,
    * occupancy, radius, n_files) — the inputs to the operational
    * split / compact / re-cluster decisions ([[splitHotCells]] when
    * occupancy outgrows the cap, [[compactIndex]] when per-batch
    * appends fragment a directory, full [[build]] when radii say the
    * layout has drifted). One partial-aggregating scan of the
    * partition column plus a driver-side listing of the ≤ nCells
    * directories (query compilation scale, not data movement).
    */
  /** Per-cell row counts — one partial-aggregating scan of the
    * partition column (no payload bytes read). Shared by [[stats]]
    * and operational reporting.
    */
  private def cellOccupancy(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"$indexPath/cells")
      .groupBy(col("centroid_id").cast("long").as("centroid_id"))
      .agg(count(lit(1)).as("occupancy"))

  def stats(spark: SparkSession, indexPath: String): DataFrame = {
    ensureGeneration(spark, indexPath)
    import spark.implicits._
    val occ = cellOccupancy(spark, indexPath)
    val files = graft.util.PartitionFiles
      .counts(spark, s"$indexPath/cells", "centroid_id")
      .toDF("centroid_id", "n_files")
    spark.read.parquet(s"$indexPath/cells_meta")
      .select(col("centroid_id").cast("long").as("centroid_id"), col("radius"))
      .join(occ, Seq("centroid_id"), "left")
      .join(broadcast(files), Seq("centroid_id"), "left")
      .select(col("centroid_id"),
        coalesce(col("occupancy"), lit(0L)).as("occupancy"),
        col("radius"),
        coalesce(col("n_files"), lit(0L)).as("n_files"))
  }

  /** Outcome of a [[splitHotCells]] pass: which cells were split (each
    * into two), which over-cap cells were left whole because every
    * member is identical (zero variance on every dimension — nothing
    * to split by; exact dedup upstream owns that pathology), and the
    * (old, fresh) id pair per split cell — side 0 keeps the old id,
    * side 1 gets the fresh one.
    */
  case class SplitReport(
      split: Seq[Long],
      degenerate: Seq[Long],
      newIds: Seq[(Long, Long)] = Nil) {
    def newCells: Int = split.size
  }

  /** Cell ids present as `centroid_id=` directories under `dir` —
    * the FILESYSTEM's view of a cell-partitioned table, as opposed to
    * `cells_meta`'s. The two disagree only inside a crashed-split
    * window — see [[repairOrphanCells]] / [[repairPendingCodes]].
    */
  private def partitionDirIds(spark: SparkSession, dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid_id="))
      .map(_.getPath.getName.stripPrefix("centroid_id=").toLong)
  }

  private[query] def cellDirIds(spark: SparkSession, indexPath: String): Seq[Long] =
    partitionDirIds(spark, s"$indexPath/cells")

  private[query] def codesDirIds(spark: SparkSession, indexPath: String): Seq[Long] =
    partitionDirIds(spark, s"$indexPath/cell_codes")

  /** A composed ([[IvfPq]]) split's in-progress marker: the (old id,
    * fresh id) pairs of the cells being moved, written BEFORE any
    * `cell_codes` mutation and deleted after the last one, so a crash
    * anywhere between leaves [[repairPendingCodes]] enough to
    * reconcile. Lives beside `cells/` — never read as part of any
    * table.
    */
  private[query] def splitPendingPath(indexPath: String): String =
    s"$indexPath/split_pending"

  /** Exact per-cell centers + radii from (__cid, __norm) member rows —
    * micro-quantized component means (order-independent, the q44
    * discipline) and max member distance: the metadata a cell needs for
    * the query-time bound. Shared by [[splitHotCells]]'s sub-cell
    * metadata and [[repairOrphanCells]]'s adoption.
    */
  private def centersAndRadii(sides: DataFrame, micro: Double): DataFrame = {
    val centers = sides
      .select(col("__cid"), posexplode(col("__norm")))
      .groupBy(col("__cid"), col("pos").cast("int").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("col").cast("double") * micro).cast("long")).as("s"))
      .withColumn("c",
        (col("s").cast("double") / col("n").cast("double") / micro).cast("float"))
      .groupBy("__cid")
      .agg(collect_list(struct(col("dim"), col("c"))).as("__dc"))
      .select(col("__cid"),
        transform(array_sort(col("__dc")), s => s.getField("c")).as("center"))
    sides
      .join(broadcast(centers), "__cid")
      .withColumn("__d", sqrt(graft.functions.l2_dist_sq(col("__norm"), col("center"))))
      .groupBy(col("__cid"), col("center"))
      .agg(max(col("__d")).as("radius"))
      .select(col("__cid").as("centroid_id"), col("center"), col("radius"))
  }

  /** Adopt ORPHAN cell directories — `centroid_id=` directories under
    * `cells/` with no `cells_meta` row. [[splitHotCells]] commits in
    * two writes (cells dynamic-overwrite, then the meta swap); a crash
    * between them leaves the fresh side-1 directory meta-less, and
    * since queries probe only meta-listed cells, its vectors are
    * INVISIBLE until repaired. This pass computes the orphan's exact
    * center + radius from its members (the same kernel the split
    * would have written) and appends the meta row — after which the
    * index is exactly the state the crashed split was committing.
    * Runs at the head of every [[splitHotCells]] pass: a driver-side
    * directory listing when healthy (no jobs), a pruned one-cell scan
    * per orphan when not. @return the adopted ids.
    */
  def repairOrphanCells(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String): Seq[Long] = {
    val cellMeta = spark.read.parquet(s"$indexPath/cells_meta")
    val metaIds = cellMeta.select(col("centroid_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val orphans = cellDirIds(spark, indexPath).filterNot(metaIds).sorted
    if (orphans.isEmpty) return Nil
    val members = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("__raw").setOutputCol("__f").setP(2.0)
      .transform(spark.read.parquet(s"$indexPath/cells")
        .filter(col("centroid_id").isin(orphans: _*))
        .withColumn("__raw",
          org.apache.spark.ml.functions.array_to_vector(
            col(embCol).cast("array<double>"))))
      .select(col("centroid_id").as("__cid"),
        org.apache.spark.ml.functions.vector_to_array(col("__f"))
          .cast("array<float>").as("__norm"))
    val updated = cellMeta
      .unionByName(centersAndRadii(members, 1e6).select(
        col("centroid_id").cast(cellMeta.schema("centroid_id").dataType),
        col("center"), col("radius")))
      .localCheckpoint()
    updated.write.mode("overwrite").parquet(s"$indexPath/cells_meta")
    orphans
  }

  /** Reconcile a composed index's `cell_codes` table with its `cells`
    * table after a crashed composed split ([[splitHotCells]] on an
    * index carrying codes). The split commits in four writes — side-1
    * codes into fresh directories, the cells dynamic-overwrite, the
    * meta swap, the old-code-directory shrink — under a
    * [[splitPendingPath]] marker naming the (old, fresh) cell pairs.
    * A crash between any two of them leaves codes that disagree with
    * cells only INSIDE the marked cells, in one of two benign shapes:
    * fresh code directories whose cells never committed (invisible —
    * no meta row probes them), or stale copies of moved rows still in
    * the old directory (a probed duplicate's candidate row carries the
    * old cell id, and the exact fetch reads the payload from `cells`,
    * where the row no longer lives under that id — so it drops out;
    * duplicate code rows can at worst transiently INFLATE the k-th
    * best certified floor, the same transiently-weaker-answers class
    * as the plain split's orphan-invisibility window).
    *
    * Repair is a reconciliation against the committed ground truth:
    * the union of code rows under every marked directory (stale copies
    * are value-identical — the codes are functions of the vector and
    * the frozen global codebooks, not of the cell) is deduplicated by
    * id, re-keyed by the cells table's committed assignment, and
    * dynamic-overwritten back; fresh code directories with no cells
    * directory are deleted. Runs at the head of every [[splitHotCells]]
    * pass; a marker-less index returns immediately (one existence
    * check, no jobs). @return the marker's pairs (empty = no repair).
    */
  def repairPendingCodes(
      spark: SparkSession,
      indexPath: String,
      idCol: String): Seq[(Long, Long)] = {
    val mp = new org.apache.hadoop.fs.Path(splitPendingPath(indexPath))
    val fs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mp)) return Nil
    val pairs = spark.read.parquet(mp.toString)
      .select(col("old_id").cast("long"), col("new_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val cellDirs = cellDirIds(spark, indexPath).toSet
    val codeDirs = codesDirIds(spark, indexPath).toSet
    val affected = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val present = affected.filter(cellDirs)
    val affectedCodes = affected.filter(codeDirs)
    if (affectedCodes.nonEmpty && present.nonEmpty) {
      // committed assignment of every member of the marked cells
      val assign = spark.read.parquet(s"$indexPath/cells")
        .filter(col("centroid_id").isin(present: _*))
        .select(col(idCol), col("centroid_id"))
      val codes = spark.read.parquet(s"$indexPath/cell_codes")
        .filter(col("centroid_id").isin(affectedCodes: _*))
        .drop("centroid_id")
        .dropDuplicates(Seq(idCol)) // stale copies are value-identical
      val fixed = codes.join(assign, idCol).localCheckpoint()
      fixed
        .transform(graft.util.PartitionedWrite.spread(
          _, present.size, col("centroid_id"), col(idCol)))
        .write.partitionBy("centroid_id").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$indexPath/cell_codes")
      // an affected code directory whose reconciled row set is EMPTY
      // is untouchable by the dynamic overwrite (it never writes an
      // empty partition) — delete it explicitly so stale copies
      // cannot outlive the repair; ≤ affected ids reach the driver
      val kept = fixed.select(col("centroid_id").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      affectedCodes.filterNot(kept).foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$indexPath/cell_codes/centroid_id=$c"), true)
        ()
      }
    }
    // a fresh-side codes directory whose cells directory never
    // committed is a remnant of the crashed first write — delete it
    pairs.map(_._2).filter(n => codeDirs(n) && !cellDirs(n)).foreach { n =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$indexPath/cell_codes/centroid_id=$n"), true)
      ()
    }
    fs.delete(mp, true)
    pairs
  }

  /** Hot-cell SPLIT maintenance — the missing half of the
    * log-structured index lifecycle next to [[upsert]] (append) and
    * [[compactIndex]] (file hygiene): repeated appends grow a cell's
    * membership and radius without bound, and since the query-time
    * triangle bound prunes per CELL, one hot cell eventually turns
    * every probe into a scan of it. Splitting an over-cap cell into
    * two tighter cells restores probe selectivity WITHOUT the full
    * re-cluster ([[build]]) — only the hot cells' rows are touched.
    *
    * Result-invisible by the same contract as [[upsert]]: the bound
    * needs only "each cell's radius covers its members", which holds
    * for the two sub-cells by construction, so a query against the
    * split index returns bit-identical top-k (gated end-to-end by
    * q106 against the full-corpus exact oracle).
    *
    * The split rule is deterministic and order-independent (the q44
    * micro-quantization discipline — no float summation order
    * anywhere): per hot cell, choose the dimension with the largest
    * exact integer variance metric `n·Σq² − (Σq)²` over
    * micro-quantized (1e-6) normalized components (DECIMAL(38,0)
    * arithmetic: |q| ≤ 1e6, so the metric needs ~2·12+log₁₀(n)
    * digits — exact past any realistic cell size where BIGINT is
    * not), ties to the lower dimension; threshold at the mean (one
    * IEEE division of two exact integers); members at or below go to
    * side 0 (keeping the old cell id), the rest to side 1 (a fresh
    * id above the current max). A nonzero metric guarantees both
    * sides are non-empty (min < mean < max). Sub-centroids are
    * micro-quantized component means; radii are exact maxima over
    * the same normalized-vector kernel the build used.
    *
    * 100 TB shape: one pruned scan of the hot cells (static `isin`
    * partition filter), one 64×-explode aggregation over ONLY those
    * members for the statistics, one dynamic-partition overwrite
    * that rewrites ONLY the split directories, and an
    * nCells-row metadata swap. Cold cells are never read. The
    * rewritten rows are localCheckpoint'd before the overwrite of
    * the directories they were read from (the [[upsert]] metadata
    * discipline, here sized hot-cells-only).
    *
    * Crash window: the commit is two writes (cells dynamic-overwrite,
    * then the meta swap) and not atomic. A crash between them leaves
    * the fresh side-1 directory meta-less — its vectors are
    * TEMPORARILY INVISIBLE to queries (which probe meta-listed cells
    * only) until the next pass's head-of-call [[repairOrphanCells]]
    * adopts it; nothing is ever lost or clobbered, because fresh ids
    * allocate above the max of meta ids AND filesystem directory ids.
    * A fully atomic commit needs a generation-directory rename, which
    * is filesystem-dependent and deliberately out of scope.
    *
    * COMPOSED indexes ([[IvfPq]]): an index carrying a `cell_codes`
    * table has its code rows moved WITH their cells — codes are
    * encoded against global codebooks, so a split changes only their
    * partition key, never a code value. The commit grows to four
    * writes ordered so the moved rows' codes are durable somewhere at
    * every crash point (side-1 codes into the fresh directories FIRST,
    * then cells, then meta, then the old code directories shrunk to
    * side 0), all under a `split_pending` marker that the next pass's
    * head-of-call [[repairPendingCodes]] uses to reconcile codes with
    * the committed cells. Until repair, a crashed composed split can
    * leave stale side-1 code copies in the old directory: a probed
    * stale copy's candidate carries the old cell id and drops out at
    * the exact payload fetch, and a doubly-probed vector can at worst
    * transiently inflate the k-th-best certified floor — the same
    * transiently-weaker-answers class as the orphan-invisibility
    * window above, repaired at the next maintenance pass.
    */
  def splitHotCells(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      occupancyCap: Long): SplitReport = {
    ensureGeneration(spark, indexPath)
    val Micro = 1e6
    // a COMPOSED index ([[IvfPq]]) keeps a cell_codes table keyed by
    // the same cell ids: its code rows move WITH their cells below
    // (codes are encoded against global codebooks, so a split changes
    // only the partition key, never a code), under the
    // [[splitPendingPath]] marker + [[repairPendingCodes]] crash story
    val codesPath = new org.apache.hadoop.fs.Path(s"$indexPath/cell_codes")
    val hasCodes = codesPath.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(codesPath)
    // crash hygiene FIRST: reconcile a crashed composed split's codes
    // with the committed cells, then adopt any meta-less directory a
    // crashed split left behind, so every vector is visible (and every
    // code agrees with its cell) before this pass decides anything
    repairPendingCodes(spark, indexPath, idCol)
    repairOrphanCells(spark, indexPath, idCol, embCol)
    // one partial-aggregating scan of (partition col) to find hot
    // cells; ≤ nCentroids ids reach the driver (the probe-pruning
    // collect pattern)
    val hot = spark.read.parquet(s"$indexPath/cells")
      .groupBy("centroid_id").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > occupancyCap)
      .select(col("centroid_id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    if (hot.isEmpty) return SplitReport(Nil, Nil)

    val cellMeta = spark.read.parquet(s"$indexPath/cells_meta")
    // fresh ids allocate above BOTH the meta's max and the filesystem's
    // max directory id: even if a concurrent/crashed writer left a
    // directory the meta (re-read above) does not list, a fresh id can
    // never collide with it — a dynamic overwrite under a collided id
    // would silently DELETE the other writer's rows
    val maxId = math.max(
      cellMeta.agg(max(col("centroid_id").cast("long"))).head.getLong(0),
      // codes directories count too: a crashed composed split can leave
      // a fresh-side codes directory the meta never saw, and a colliding
      // fresh id would dynamic-overwrite it with another cell's codes
      (cellDirIds(spark, indexPath) ++ codesDirIds(spark, indexPath))
        .foldLeft(Long.MinValue)(math.max))

    // members of the hot cells only — pruned scan, normalized exactly
    // as the build's assignment pass ([[selfKnnGraph]] re-derive)
    val members = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("__raw").setOutputCol("__f").setP(2.0)
      .transform(spark.read.parquet(s"$indexPath/cells")
        .filter(col("centroid_id").isin(hot: _*))
        .withColumn("__raw",
          org.apache.spark.ml.functions.array_to_vector(
            col(embCol).cast("array<double>"))))
      .select(col(idCol), col(embCol), col("centroid_id"),
        org.apache.spark.ml.functions.vector_to_array(col("__f"))
          .cast("array<float>").as("__norm"))
      .localCheckpoint() // feeds stats, sides, rewrite AND is the
    // frame whose source directories the rewrite overwrites

    // exact per-(cell, dim) variance metric on micro-quantized longs
    val dec = "decimal(38,0)"
    val stats = members
      .select(col("centroid_id"), posexplode(col("__norm")))
      .select(col("centroid_id"), col("pos").cast("int").as("dim"),
        floor(col("col").cast("double") * Micro).cast("long").as("q"))
      .groupBy("centroid_id", "dim")
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(col("q").cast(dec) * col("q").cast(dec)).as("ss"))
      .withColumn("varm",
        col("n").cast(dec) * col("ss") - col("s").cast(dec) * col("s").cast(dec))
    // argmax dimension per cell — an nHot×dim frame, window is fine
    val wv = Window.partitionBy(col("centroid_id"))
      .orderBy(col("varm").desc, col("dim").asc)
    val splitInfo = stats
      .withColumn("__rn", row_number().over(wv))
      .filter(col("__rn") === 1 && col("varm") > 0)
      .select(col("centroid_id"),
        col("dim").as("__sdim"),
        (col("s").cast("double") / col("n").cast("double")).as("__mean_q"))
    val splittable = splitInfo.select(col("centroid_id").cast("long"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val degenerate = hot.filterNot(splittable.contains)
    if (splittable.isEmpty) return SplitReport(Nil, degenerate)

    // side assignment + new ids: side 0 keeps the old id, side 1 maps
    // to maxId + 1 + rank(old id) — a driver-built splittable-sized map
    import spark.implicits._
    val idPairs = splittable.zipWithIndex
      .map { case (old, i) => (old, maxId + 1 + i) }
    val idMap = idPairs.toDF("centroid_id", "__new_cid")
    val sides = members
      .join(broadcast(splitInfo), "centroid_id")
      .join(broadcast(idMap), "centroid_id")
      .withColumn("__q",
        floor(element_at(col("__norm"), col("__sdim") + 1).cast("double") * Micro)
          .cast("long"))
      .withColumn("__cid",
        when(col("__q") <= col("__mean_q"), col("centroid_id").cast("long"))
          .otherwise(col("__new_cid")))
      .select(col(idCol), col(embCol), col("__norm"),
        col("centroid_id").as("__oldcid"),
        col("__cid").cast(members.schema("centroid_id").dataType).as("__cid"))
      .localCheckpoint()

    // COMPOSED index: the affected code rows, re-keyed by their new
    // side. Checkpointed once — it feeds the fresh-directory write
    // below AND the old-directory shrink after the meta swap, and the
    // latter overwrites the directories this frame was read from.
    val codesAssigned = if (!hasCodes) None else Some {
      // marker FIRST: from here until the last codes write, a crash at
      // any point is reconcilable by [[repairPendingCodes]]
      idPairs.toDF("old_id", "new_id").repartition(1)
        .write.mode("overwrite").parquet(splitPendingPath(indexPath))
      spark.read.parquet(s"$indexPath/cell_codes")
        .filter(col("centroid_id").isin(splittable: _*))
        .withColumnRenamed("centroid_id", "__oldpart")
        .join(sides.select(col(idCol), col("__cid"), col("__oldcid")), idCol)
        .localCheckpoint()
    }
    def writeCodes(part: DataFrame, nDirs: Int): Unit = {
      val dataCols = part.columns
        .filterNot(Set("__cid", "__oldcid", "__oldpart")).map(col).toSeq
      part.select(dataCols :+ col("__cid").as("centroid_id"): _*)
        .transform(graft.util.PartitionedWrite.spread(
          _, nDirs, col("centroid_id"), col(idCol)))
        .write.partitionBy("centroid_id").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(s"$indexPath/cell_codes")
    }
    // side-1 codes land in the FRESH directories before anything
    // existing moves: every later crash point leaves the moved rows'
    // codes durable somewhere (at worst duplicated, never lost)
    codesAssigned.foreach(ca =>
      writeCodes(ca.filter(col("__cid").cast("long") =!= col("__oldcid").cast("long")),
        splittable.size))

    // sub-centroids (micro-quantized component means, order-independent)
    // + exact radii — the shared [[centersAndRadii]] kernel
    val newMeta = centersAndRadii(sides.drop("__oldcid"), Micro)

    // rewrite ONLY the split directories (side-0 rows land back in the
    // old ones, side-1 rows create the fresh ones)
    sides
      .select(col(idCol), col(embCol), col("__cid").as("centroid_id"))
      .transform(graft.util.PartitionedWrite.spread(
        _, splittable.size * 2, col("centroid_id"), col(idCol)))
      .write.partitionBy("centroid_id").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$indexPath/cells")
    val updated = cellMeta
      .filter(!col("centroid_id").isin(splittable: _*))
      .unionByName(newMeta.select(
        col("centroid_id").cast(cellMeta.schema("centroid_id").dataType),
        col("center"), col("radius")))
      .localCheckpoint()
    updated.write.mode("overwrite").parquet(s"$indexPath/cells_meta")
    // shrink the old code directories to their side-0 rows LAST: until
    // here the stale side-1 copies in them are what keeps a crash
    // lossless, and from here cells/meta/fresh-codes are all committed.
    // The mid-write kill window of this dynamic overwrite is the same
    // accepted residual as the cells overwrite above (a fully atomic
    // commit needs a generation-directory rename — out of scope);
    // every BETWEEN-write crash point reconciles via the marker.
    codesAssigned.foreach { ca =>
      val side0 = ca.filter(
        col("__cid").cast("long") === col("__oldcid").cast("long"))
      writeCodes(side0, splittable.size)
      // dynamic overwrite cannot EMPTY a partition — a split cell
      // whose surviving code rows all moved to side 1 (possible only
      // after a torn upsert left codes < occupancy) would keep its
      // stale copies forever. Delete such directories explicitly;
      // ≤ splittable ids reach the driver.
      val kept = side0.select(col("__cid").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet
      val fs = new org.apache.hadoop.fs.Path(s"$indexPath/cell_codes")
        .getFileSystem(spark.sessionState.newHadoopConf())
      splittable.filterNot(kept).foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$indexPath/cell_codes/centroid_id=$c"), true)
        ()
      }
      val mp = new org.apache.hadoop.fs.Path(splitPendingPath(indexPath))
      fs.delete(mp, true)
      ()
    }
    SplitReport(splittable, degenerate, idPairs)
  }

  private def centersOf(spark: SparkSession, model: KMeansModel): DataFrame = {
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("centroid_id", "center")
  }

  /** The indexed rows with their normalized float vectors re-derived
    * exactly as the build's assignment pass (so stored radii bound
    * them): (idCol, embCol, centroid_id, __norm) — shared by every
    * corpus-as-queries pattern.
    */
  private[query] def normalizedAssigned(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String): DataFrame =
    new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("__raw").setOutputCol("__f").setP(2.0)
      .transform(spark.read.parquet(s"$indexPath/cells")
        .withColumn("__raw",
          org.apache.spark.ml.functions.array_to_vector(
            col(embCol).cast("array<double>"))))
      .select(col(idCol), col(embCol), col("centroid_id"),
        org.apache.spark.ml.functions.vector_to_array(col("__f"))
          .cast("array<float>").as("__norm"))

  /** Per-(cell, label) radii — max distance of a cell's members with
    * that label to the cell centroid. An nCells × nLabels frame,
    * derived at query/mining time from labeled assigned rows (the
    * index itself stays label-free); the label-restricted triangle
    * bound `sim(q, x∈c with label L) ≤ 1 − max(0, d(q,c) − r(c,L))²/2`
    * is exactly the cell bound with the tighter per-label radius.
    */
  private[query] def cellLabelRadii(
      assigned: DataFrame,
      cellMeta: DataFrame,
      labelCol: String): DataFrame =
    assigned
      // no (cell, null) rows: a null label can never equi-match a
      // query's label, so the row would only inflate the artifact and
      // the fanout count the branch decision reads — and [[foldLabelMeta]]
      // filters nulls the same way, keeping folded and built artifacts
      // shape-identical
      .filter(col(labelCol).isNotNull)
      .join(broadcast(cellMeta.select(col("centroid_id"), col("center"))),
        "centroid_id")
      .withColumn("__d",
        sqrt(graft.functions.l2_dist_sq(col("__norm"), col("center"))))
      .groupBy(col("centroid_id"), col(labelCol))
      .agg(max(col("__d")).as("__rl"))

  private def labelMetaPath(indexPath: String, labelCol: String): String =
    s"$indexPath/label_meta_${labelCol.replaceAll("[^A-Za-z0-9_-]", "_")}"

  /** Persist the per-(cell, label) radius metadata that
    * [[queryTopKFiltered]] needs, making the filtered path
    * build-once/query-many like every other index artifact: without
    * this, each call re-reads every indexed VECTOR to recompute an
    * nCells × nLabels frame; with it, a call reads the tiny persisted
    * frame and proves freshness from parquet metadata + a directory
    * listing — no payload bytes.
    *
    * Staleness is checked SOUNDLY via a (total rows, cell id set)
    * snapshot taken here (before the radii pass, so a racing append
    * between the two reads this build as stale rather than fresh),
    * exhaustive over the index's mutation surface: [[upsert]] either
    * FOLDS the batch into this artifact and advances the snapshot
    * (when the batch carries the label column — the radii max-merge
    * in [[upsertCells]], exact because an append can only grow
    * per-(cell, label) radii) or leaves the snapshot behind the grown
    * row count (stale, detected), [[splitHotCells]] always mints
    * fresh cell directories (id set changes), [[compactIndex]] is
    * row-count-verified and assignment-preserving (correctly stays
    * fresh), and a full [[build]] — the one rewrite that could
    * reproduce both fingerprints with different contents — deletes
    * every label-meta artifact explicitly. The LABEL side has no such
    * fingerprint: the caller owns invalidation when the labels frame
    * itself changes (rebuild here), the usual secondary-index
    * contract. A stale artifact is never served — [[queryTopKFiltered]]
    * falls back to the per-call recompute, so answers cannot go wrong,
    * only the cost reverts.
    */
  def buildLabelMeta(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      labels: DataFrame,
      labelCol: String): Unit = {
    ensureGeneration(spark, indexPath)
    import spark.implicits._
    val base = labelMetaPath(indexPath, labelCol)
    // snapshot FIRST (see the staleness note above)
    val snap = (spark.read.parquet(s"$indexPath/cells").count(),
      cellDirIds(spark, indexPath).sorted)
    val cellMeta = broadcast(spark.read.parquet(s"$indexPath/cells_meta"))
    // live rows only — the artifact bounds what queries can serve; the
    // freshness fingerprint above still counts RAW rows, so a later
    // compaction (which changes that count) stales it automatically
    val assigned = Tombstones.liveOnly(
        normalizedAssigned(spark, indexPath, idCol, embCol),
        spark, indexPath, idCol)
      .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
    cellLabelRadii(assigned, cellMeta, labelCol)
      .write.mode("overwrite").parquet(s"$base/radii")
    // label_col rides the snapshot so [[upsertCells]] can fold a
    // label-carrying batch into this artifact without guessing the
    // column back out of the sanitized directory name
    Seq((snap._1, snap._2, labelCol)).toDF("rows", "cells", "label_col")
      .repartition(1).write.mode("overwrite").parquet(s"$base/snapshot")
  }

  /** The persisted [[buildLabelMeta]] radii IF present and provably
    * fresh (total row count and cell id set match the build-time
    * snapshot — see the soundness argument there), else None. The
    * count is parquet-metadata-only and the id set a driver-side
    * directory listing: no shuffle, no payload read, no
    * data-proportional work.
    */
  private[graft] def cachedLabelRadii(
      spark: SparkSession,
      indexPath: String,
      labelCol: String): Option[DataFrame] = {
    val base = labelMetaPath(indexPath, labelCol)
    val rp = new org.apache.hadoop.fs.Path(s"$base/radii")
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rp) ||
        !fs.exists(new org.apache.hadoop.fs.Path(s"$base/snapshot"))) return None
    // Try-wrapped end to end: an UNREADABLE snapshot or radii table (a
    // crash mid-overwrite left an empty/partial directory) reads as
    // absent — the documented fail-safe. Answers then come from the
    // per-call derivation; only the cost reverts, never correctness.
    scala.util.Try {
      val snap = spark.read.parquet(s"$base/snapshot").head
      val fresh =
        snap.getAs[Long]("rows") == spark.read.parquet(s"$indexPath/cells").count() &&
          snap.getSeq[Long](snap.fieldIndex("cells")).toSeq ==
            cellDirIds(spark, indexPath).sorted
      if (fresh) Some(spark.read.parquet(s"$base/radii")) else None
    }.toOption.flatten
  }

  /** Delete every persisted [[buildLabelMeta]] artifact — called by
    * [[build]]: a rebuild is the one mutation that can reproduce the
    * snapshot fingerprints with different cell contents, so it must
    * invalidate explicitly.
    */
  private[query] def invalidateLabelMeta(spark: SparkSession, indexPath: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(root))
      fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("label_meta_"))
        .foreach { s => fs.delete(s.getPath, true); () }
  }

  /** FILTERED batch top-k: per-query top-k restricted to corpus rows
    * whose `labelCol` equals the query's — the attribute-constrained
    * ("filtered ANN") retrieval every production vector store serves,
    * here EXACT by the per-(cell, label) radius bound. A query probes
    * only cells that actually CONTAIN its label (rare labels probe
    * almost nowhere regardless of geometry), seeds a floor from the
    * `probeWidth` nearest such cells, and extends to exactly the
    * label-holding cells whose label-radius bound can still beat it.
    * Candidates are label-filtered before ranking, so the exact kernel
    * prices only qualifying rows.
    *
    * 100 TB shape: the label metadata is the persisted
    * [[buildLabelMeta]] artifact (build once, query many — a fresh
    * call reads the tiny radii frame after a metadata-only freshness
    * proof, no vector payloads; absent or stale it is derived per
    * call, one nCells × nLabels aggregation over the index); probes
    * read only label-holding cell directories via the same static
    * `isin` pruning as [[queryTopK]]. For high-cardinality predicates
    * the radii frame grows toward corpus size — past `maxLabelFanout`
    * the call AUTOMATICALLY branches to [[queryTopK]] overfetch +
    * post-filter + refill ([[filteredViaOverfetch]]): same exact
    * answers, and the only corpus-proportional artifact anywhere is
    * the index scan the unfiltered bound already prices.
    *
    * @param queries (queryIdCol, queryVecCol, labelCol) — the wanted
    *                label rides the query row
    * @param labels  (idCol, labelCol) corpus label source
    * @param maxLabelFanout the largest per-(cell, label) radii frame
    *                this call may build/broadcast — measured as the
    *                persisted artifact's row count when one is fresh,
    *                else estimated as `approx_count_distinct(label)`
    *                (a lower bound on the pairs frame). Past it the
    *                overfetch fallback runs instead.
    * @param refillCap the fallback's per-query overfetch ceiling
    *                before a still-deficient query escalates to the
    *                direct label-equijoin ranking (cost knob only —
    *                every path is exact)
    * @return (queryIdCol, idCol, sim, rn), rn 1..k by sim desc, ties
    *         ascending id — only label-matching rows appear
    */
  def queryTopKFiltered(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      labels: DataFrame,
      labelCol: String,
      k: Int,
      threshold: Double,
      probeWidth: Int = 1,
      maxLabelFanout: Long = 1000000L,
      refillCap: Long = RefillCap): DataFrame =
    queryTopKFilteredWithPath(spark, indexPath, idCol, embCol, queries,
      queryIdCol, queryVecCol, labels, labelCol, k, threshold, probeWidth,
      maxLabelFanout, refillCap)._1

  /** [[queryTopKFiltered]] plus which path ran (`true` = the
    * high-cardinality overfetch fallback) — the branch decision,
    * spec-checkable.
    */
  private[graft] def queryTopKFilteredWithPath(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      labels: DataFrame,
      labelCol: String,
      k: Int,
      threshold: Double,
      probeWidth: Int = 1,
      maxLabelFanout: Long = 1000000L,
      refillCap: Long = RefillCap): (DataFrame, Boolean) = {
    ensureGeneration(spark, indexPath)
    // branch on the size of the radii frame this call would otherwise
    // build AND broadcast: the fresh artifact's row count when present
    // (parquet-metadata-only), else approx_count_distinct over the
    // labels frame — one narrow partial-aggregated scan, vastly cheaper
    // than the nCells × nLabels derivation it guards
    val cached = cachedLabelRadii(spark, indexPath, labelCol)
    val fanout = cached.map(_.count()).getOrElse(
      labels.agg(approx_count_distinct(col(labelCol))).head.getLong(0))
    if (fanout > maxLabelFanout)
      (filteredViaOverfetch(spark, indexPath, idCol, embCol, queries,
        queryIdCol, queryVecCol, labels, labelCol, k, threshold, probeWidth,
        refillCap), true)
    else
      (filteredViaLabelRadii(spark, indexPath, idCol, embCol, queries,
        queryIdCol, queryVecCol, labels, labelCol, k, threshold, probeWidth,
        cached)._1, false)
  }

  /** MULTI-LABEL (disjunctive) filtered batch top-k: per-query top-k
    * restricted to corpus rows whose label is IN the query's label
    * SET — the `WHERE label IN (...)` retrieval production stores
    * serve next to the equality filter. Exact by containment: a
    * corpus row carries ONE label, so the true top-k over a label
    * set's mates is contained in the union of the per-label top-ks,
    * and each per-label retrieval is the exact [[queryTopKFiltered]]
    * machinery verbatim (label-radius path or high-cardinality
    * fallback, branch per call) — one synthetic (query, label)
    * retrieval unit per set member, deduplicated, then one final
    * answer-sized global re-rank. No row can double-surface (one
    * label per corpus row ⇒ at most one unit yields it).
    *
    * @param queries (queryIdCol, queryVecCol, labelSetCol) — the
    *                wanted labels ride each query row as an ARRAY
    * @return (queryIdCol, idCol, sim, rn), rn 1..k by sim desc, ties
    *         ascending id — only rows whose label is in the query's
    *         set appear; an empty or all-absent set yields no rows
    */
  def queryTopKFilteredAny(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      labelSetCol: String,
      labels: DataFrame,
      labelCol: String,
      k: Int,
      threshold: Double,
      probeWidth: Int = 1,
      maxLabelFanout: Long = 1000000L,
      refillCap: Long = RefillCap): DataFrame =
    filteredAnyVia(queries, queryIdCol, queryVecCol, labelSetCol, labelCol,
      idCol, k,
      ex => queryTopKFiltered(spark, indexPath, idCol, embCol, ex,
        "__fq", queryVecCol, labels, labelCol, k, threshold, probeWidth,
        maxLabelFanout, refillCap))

  /** The shared multi-label reduction ([[queryTopKFilteredAny]] /
    * [[IvfPq.queryTopKFilteredAny]]): explode each query's label set
    * into deduplicated (query, label) retrieval units keyed by a
    * composite struct id, run the single-label engine once over the
    * whole unit batch, strip the composite, and take the global
    * per-query top-k over the union — answer-sized (≤ |set| × k rows
    * per query reach the final `topk_by`).
    */
  private[query] def filteredAnyVia(
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      labelSetCol: String,
      labelCol: String,
      idCol: String,
      k: Int,
      engine: DataFrame => DataFrame): DataFrame = {
    val ex = queries
      .select(col(queryIdCol), col(queryVecCol),
        explode(col(labelSetCol)).as(labelCol))
      // duplicate labels in one set must not double the unit (and with
      // it the row's presence in the union); the distinct is
      // query-batch-sized
      .distinct()
      .select(
        struct(col(queryIdCol).as("q"), col(labelCol).as("l")).as("__fq"),
        col(queryVecCol), col(labelCol))
    engine(ex)
      .select(col("__fq").getField("q").as(queryIdCol), col(idCol), col("sim"))
      .transform(SimilaritySearch.topKExplode(_, queryIdCol, idCol, "sim", k))
  }

  /** The label-radius path of [[queryTopKFiltered]] — exact by the
    * per-(cell, label) triangle bound; `cached` is the already-probed
    * [[cachedLabelRadii]] result (None → per-call derivation). Returns
    * the result plus a LAZY diagnostic frame of the (query, cell)
    * pairs actually probed (the label-driven restriction, read by the
    * scaling-curve report; never evaluated in production).
    */
  private[graft] def filteredViaLabelRadii(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      labels: DataFrame,
      labelCol: String,
      k: Int,
      threshold: Double,
      probeWidth: Int,
      cached: Option[DataFrame]): (DataFrame, DataFrame) = {
    val cellMeta = broadcast(spark.read.parquet(s"$indexPath/cells_meta"))
    // per-(cell, label) radii: the persisted [[buildLabelMeta]]
    // artifact when present and provably fresh (a parquet-metadata
    // count + directory listing, no vector reads), else derived per call
    // from the assigned rows — a cost fallback, never a correctness
    // one (a stale artifact is detected, not served)
    val cellLabel = cached.getOrElse {
      // live rows only: radii need to bound only what can be SERVED
      // (a persisted artifact built pre-delete stays valid the other
      // way around — over a superset — see [[Tombstones]])
      val assigned = Tombstones.liveOnly(
          normalizedAssigned(spark, indexPath, idCol, embCol),
          spark, indexPath, idCol)
        .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
      cellLabelRadii(assigned, cellMeta, labelCol).localCheckpoint()
    }

    val qNorm = AnnIndex.prepared(
        queries.select(col(queryIdCol), col(queryVecCol).as("__qv"), col(labelCol)),
        queryIdCol, "__qv")
      .join(queries.select(col(queryIdCol), col(labelCol)), Seq(queryIdCol))
      .select(col(queryIdCol), col("__qv").as(queryVecCol), col(labelCol),
        org.apache.spark.ml.functions.vector_to_array(col("features"))
          .cast("array<float>").as("__qnorm"))

    // per (query, label-holding cell): probe order + label-radius bound
    val wCent = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cdist").asc, col("centroid_id").asc)
    val qCells = qNorm
      .join(broadcast(cellLabel), Seq(labelCol))
      .join(cellMeta.select(col("centroid_id"), col("center")), Seq("centroid_id"))
      .withColumn("cdist",
        sqrt(graft.functions.l2_dist_sq(col("__qnorm"), col("center"))))
      .withColumn("ub_sim",
        lit(1.0) - pow(
          greatest(lit(0.0), col("cdist") - col("__rl") - lit(RadiusPad)), 2) / 2)
      .withColumn("crank", row_number().over(wCent))
      .select(col(queryIdCol), col(queryVecCol), col(labelCol),
        col("centroid_id"), col("ub_sim"), col("crank"))

    def probe(sel: DataFrame): DataFrame = {
      val selM = sel.select(col(queryIdCol), col(queryVecCol), col(labelCol),
        col("centroid_id")).localCheckpoint()
      val probed = selM.select("centroid_id").distinct()
        .collect().map(_.get(0)).toSeq
      // fresh pruned read (the selfKnnGraph pass-2 idiom): the static
      // isin filter reaches the parquet scan directly, labels attached
      // to just the probed rows; tombstones mask before the floor
      Tombstones.liveOnly(
          spark.read.parquet(s"$indexPath/cells")
            .filter(col("centroid_id").isin(probed: _*)),
          spark, indexPath, idCol)
        .select(col(idCol), col(embCol), col("centroid_id"))
        .join(labels.select(col(idCol), col(labelCol).as("__clabel")), Seq(idCol))
        .join(broadcast(selM), "centroid_id")
        .filter(col("__clabel") === col(labelCol))
        .withColumn("sim", cosine_sim(col(embCol), col(queryVecCol)))
        .filter(col("sim") > threshold)
        .select(col(queryIdCol), col(idCol), col("sim"))
    }

    val pass1 = probe(qCells.filter(col("crank") <= probeWidth)).localCheckpoint()
    val floor = SimilaritySearch.kthBestScore(
      pass1, queryIdCol, idCol, "sim", k, "floor_sim")
    val sel2 = qCells.filter(col("crank") > probeWidth)
      .join(floor, Seq(queryIdCol), "left")
      .filter(col("ub_sim") > threshold &&
        col("ub_sim") >= coalesce(col("floor_sim"), lit(threshold)))
    val pass2 = probe(sel2)

    (pass1.unionByName(pass2)
      .transform(SimilaritySearch.topKExplode(_, queryIdCol, idCol, "sim", k)),
      qCells.filter(col("crank") <= probeWidth)
        .select(col(queryIdCol), col("centroid_id"))
        .unionByName(sel2.select(col(queryIdCol), col("centroid_id")))
        .distinct())
  }

  /** The HIGH-CARDINALITY path of [[queryTopKFiltered]]: when the
    * per-(cell, label) radii frame would approach corpus size (a
    * near-unique label column), restricting probes per label buys
    * nothing — so run the UNFILTERED [[queryTopK]] with an overfetch,
    * post-filter to label-mates, and REFILL any query whose matches
    * came up short.
    *
    * Exactness argument per finished query: it finishes in a round
    * either with ≥ k label-mates among the global top-`kk` (any
    * label-mate outside that top-kk scores below every kept one — the
    * true filtered top-k is inside), or with the round's hit list
    * UN-truncated (fewer than `kk` rows passed the threshold at all,
    * so the matches are ALL label-mates above the threshold), or at
    * `kk = corpus` (same). A query can therefore never finish with a
    * label-mate missing from its collected matches.
    *
    * Cost shape: each round is one [[queryTopK]] over only the still-
    * deficient queries at 4× the previous overfetch — ≤ log₄(cap/k)
    * rounds, each answer-sized on the wire; the only driver-side
    * values are per-round COUNTS (no row collects). With a sane
    * overfetch the first round finishes the typical query: on a
    * near-unique label most queries have < k label-mates TOTAL and
    * finish via the untruncated/exhausted rule. The overfetch never
    * exceeds [[RefillCap]] per query: a query still deficient there
    * (its label is dense in similarity space yet its mates rank below
    * tens of thousands of non-mates) ESCALATES to the direct
    * label-equijoin ranking — all its mates found by one equijoin on
    * the labels frame and ranked exactly, answer-sized for the sparse
    * labels this branch serves and bounded by one labels scan + one
    * pruned-nothing ranking pass in the adversarial dense case, which
    * is the problem's true lower bound. Without the cap the refill
    * would grow the per-query top-k heap (and the hit frame) toward
    * corpus size — the exact blow-up this branch exists to avoid.
    */
  private[query] def filteredViaOverfetch(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      labels: DataFrame,
      labelCol: String,
      k: Int,
      threshold: Double,
      probeWidth: Int,
      refillCap: Long = RefillCap,
      // the unfiltered top-k engine each refill round runs —
      // (still-deficient queries, kk) => hits. Defaults to this
      // index's [[queryTopK]]; [[IvfPq]] passes its composed engine so
      // the high-cardinality branch rides the memory-bound layout (the
      // escalation equijoin below reads the shared `cells/` payloads
      // either way). Any EXACT engine preserves the branch's
      // exactness argument verbatim — the proof only uses "the global
      // top-kk is the true top-kk".
      topKFn: Option[(DataFrame, Int) => DataFrame] = None): DataFrame = {
    val runTopK = topKFn.getOrElse((pending: DataFrame, kk: Int) =>
      queryTopK(spark, indexPath, idCol, embCol, pending,
        queryIdCol, queryVecCol, kk, threshold, probeWidth))
    // parquet-metadata-only row count: the overfetch ceiling
    val corpusN = math.min(
      spark.read.parquet(s"$indexPath/cells").count(),
      Int.MaxValue.toLong)
    // per-query overfetch ceiling before escalating to the direct
    // equijoin — past this the top-k heaps and the hit frame grow
    // toward corpus size, while one labels-scan equijoin is flat
    val hardCap = math.max(math.min(corpusN, math.max(refillCap, k.toLong)), 1L)
    val corpLab = labels.select(col(idCol), col(labelCol).as("__clabel"))
    var pending = queries
      .select(col(queryIdCol), col(queryVecCol), col(labelCol))
      .localCheckpoint()
    var nPending = pending.count()
    // first overfetch: 4k (floored at k+8 so tiny k still overfetches)
    var kk = math.min(math.max(4L * k, k + 8L), hardCap)
    val parts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    while (nPending > 0) {
      val exhausted = kk >= corpusN
      val atCap = kk >= hardCap
      // materialized once: the hit list feeds the label join AND the
      // truncation tally below
      val hits = runTopK(pending, kk.toInt).localCheckpoint()
      // label every hit and compare against the query's wanted label;
      // LEFT join — an id the labels frame does not cover can never
      // match (same as the radii path's inner label join) but must
      // still COUNT toward the truncation test below, or a top-kk
      // padded with unlabeled rows would read as un-truncated and
      // finish a query whose label-mates hide below the cut. The hits
      // side is answer-sized (≤ pending × kk rows of a fixed narrow
      // shape — query id, id, sim, rn ≈ 48 B serialized each): hint it
      // broadcast while that a-priori byte bound fits the broadcast
      // budget the DEPLOYMENT configured (spark.sql.
      // autoBroadcastJoinThreshold — config-derived, not a hardcoded
      // row count blind to driver memory), and let the planner choose
      // from the checkpointed frame's real stats once the refill has
      // grown it past that (forcing a broadcast there is the
      // driver-OOM shape). Threshold −1 (auto-broadcast disabled)
      // disables the forced hint the same way.
      val bcBytes = spark.sessionState.conf.autoBroadcastJoinThreshold
      val hitsJ =
        if (bcBytes > 0 && nPending * kk * HitRowBytes <= bcBytes) broadcast(hits)
        else hits
      val labeled = hitsJ
        .join(corpLab, Seq(idCol), "left")
        .join(broadcast(pending.select(col(queryIdCol), col(labelCol))),
          Seq(queryIdCol))
        .withColumn("__is_match", col("__clabel") === col(labelCol))
        .localCheckpoint()
      val matched = labeled.filter(col("__is_match"))
        .select(col(queryIdCol), col(idCol), col("sim"))
      // a query refills iff its matches came up short AND its hit list
      // was truncated at kk (more corpus rows may hide below) AND the
      // overfetch can still grow. The truncation tally counts the RAW
      // hits — one row per (query, id) by the topKExplode contract —
      // not the labeled rows, which a multi-label corpus would inflate
      // past kk and so misread truncation as completion
      val deficient =
        if (exhausted) pending.select(col(queryIdCol)).limit(0)
        else hits.groupBy(col(queryIdCol)).agg(count(lit(1)).as("__tot"))
          .join(
            matched.groupBy(col(queryIdCol)).agg(count(lit(1)).as("__m")),
            Seq(queryIdCol), "left")
          .filter(coalesce(col("__m"), lit(0L)) < k && col("__tot") === kk)
          .select(col(queryIdCol))
          .localCheckpoint()
      parts += matched.join(deficient, Seq(queryIdCol), "left_anti")
      if (atCap && !exhausted) {
        // escalation: queries still deficient at the refill cap take
        // the direct label-equijoin ranking — every mate of the
        // query's label found by the equijoin, exact-ranked; their
        // overfetch rows above are superseded wholesale (left_anti
        // already excluded them from parts)
        val stubborn = pending.join(deficient, Seq(queryIdCol), "left_semi")
        val mates = corpLab.join(
            broadcast(stubborn
              .select(col(queryIdCol), col(queryVecCol), col(labelCol))),
            col("__clabel") === col(labelCol))
          .select(col(queryIdCol), col(idCol), col(queryVecCol))
        // mates vs the payload table: sized by label density — leave
        // the join strategy to the planner (broadcast when sparse).
        // Tombstones mask here too — the equijoin bypasses the
        // (already-masked) probe machinery entirely
        parts += Tombstones.liveOnly(
            spark.read.parquet(s"$indexPath/cells"),
            spark, indexPath, idCol)
          .select(col(idCol), col(embCol))
          .join(mates, Seq(idCol))
          .withColumn("sim", cosine_sim(col(embCol), col(queryVecCol)))
          .filter(col("sim") > threshold)
          .select(col(queryIdCol), col(idCol), col("sim"))
        nPending = 0
      } else {
        pending = pending.join(deficient, Seq(queryIdCol), "left_semi")
          .localCheckpoint()
        nPending = deficient.count()
        kk = math.min(kk * 4, hardCap)
      }
    }
    parts.reduceOption(_ unionByName _)
      .map(SimilaritySearch.topKExplode(_, queryIdCol, idCol, "sim", k))
      .getOrElse(
        // empty query batch: an empty frame in the contract shape
        queries.select(col(queryIdCol)).limit(0)
          .withColumn(idCol, lit(null).cast("long"))
          .withColumn("sim", lit(null).cast("double"))
          .withColumn("rn", lit(null).cast("long")))
  }

  /** Batch top-k against a built IVF index, exact by the cell-radius
    * bound. `probeWidth` is a cost knob, not a recall knob: the first
    * pass probes the `probeWidth` nearest cells to seed the k-th-best
    * floor (wider = tighter floor = fewer second-pass probes for dense
    * query batches); the second pass probes exactly the cells whose
    * bound still reaches that floor. Output: (queryIdCol, idCol, sim,
    * rn) — rn 1..k by descending exact sim, ties broken by ascending id.
    *
    * Probe ranking uses the assignment metric (Euclidean distance of
    * the NORMALIZED query to the centroid): centroids are means of unit
    * vectors with varying norms, so cosine ranking would probe
    * different cells than assignment used.
    */
  def queryTopK(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      threshold: Double,
      probeWidth: Int = 1): DataFrame =
    queryTopKWithProbes(spark, indexPath, idCol, embCol, queries,
      queryIdCol, queryVecCol, k, threshold, probeWidth)._1

  /** [[queryTopK]] plus two LAZY diagnostic frames: the (query, cell)
    * pairs actually probed across both passes, and the exact-ranked
    * candidate rows — the pruning evidence the scaling-curve report
    * and the plan-shape specs read. The production path never
    * evaluates them.
    */
  private[graft] def queryTopKWithProbes(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      threshold: Double,
      probeWidth: Int = 1): (DataFrame, DataFrame, DataFrame) = {
    // one fs.exists when healthy: completes a crashed recluster swap
    // so no reader ever sees a torn generation pair
    ensureGeneration(spark, indexPath)
    // (centroid_id, center, radius) — only populated cells have a row,
    // and only populated cells can produce candidates
    val cellMeta = broadcast(spark.read.parquet(s"$indexPath/cells_meta"))

    val qNorm = AnnIndex.prepared(
        queries.select(col(queryIdCol), col(queryVecCol).as("__qv")), queryIdCol, "__qv")
      .select(col(queryIdCol), col("__qv").as(queryVecCol),
        org.apache.spark.ml.functions.vector_to_array(col("features"))
          .cast("array<float>").as("__qnorm"))

    // per (query, cell): probe-order distance + completeness bound
    val wCent = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cdist").asc, col("centroid_id").asc)
    val qCells = qNorm.crossJoin(cellMeta)
      .withColumn("cdist",
        sqrt(graft.functions.l2_dist_sq(col("__qnorm"), col("center"))))
      .withColumn("ub_sim",
        lit(1.0) - pow(
          greatest(lit(0.0), col("cdist") - col("radius") - lit(RadiusPad)), 2) / 2)
      .withColumn("crank", row_number().over(wCent))
      .select(col(queryIdCol), col(queryVecCol), col("centroid_id"),
        col("ub_sim"), col("crank"))

    val cells = spark.read.parquet(s"$indexPath/cells")
    // probe: candidates of the selected (query, cell) rows, exact-ranked.
    // The selection is materialized once and its distinct cell ids
    // (driver collect ≤ nCentroids, the LexicalSearch bucket pattern)
    // are pushed as a STATIC `isin` partition filter — the cells scan
    // prunes to the probed `centroid_id=` directories at planning time
    // instead of reading the whole index and relying on DPP to fire.
    def probe(sel: DataFrame): DataFrame = {
      val selM = sel.select(col(queryIdCol), col(queryVecCol), col("centroid_id"))
        .localCheckpoint()
      val probed = selM.select("centroid_id").distinct()
        .collect().map(_.get(0)).toSeq
      // deleted rows mask out HERE — before the floor this pass seeds:
      // a tombstoned candidate allowed into the k-th-best floor could
      // certify a cutoff above a live row's true rank (Tombstones doc)
      Tombstones.liveOnly(
          cells.filter(col("centroid_id").isin(probed: _*)),
          spark, indexPath, idCol)
        .join(broadcast(selM), "centroid_id")
        .withColumn("sim", cosine_sim(col(embCol), col(queryVecCol)))
        .filter(col("sim") > threshold)
        .select(col(queryIdCol), col(idCol), col("sim"))
    }

    // materialized once: the pass-1 candidates feed the floor AND the
    // final union — without this the probed cells are re-scanned and
    // re-ranked per consumer (2-3x the first-pass cost)
    val pass1 = probe(qCells.filter(col("crank") <= probeWidth)).localCheckpoint()
    // per-query floor: the k-th best pass-1 similarity (absent when the
    // nearest cells held fewer than k candidates -> floor = threshold).
    // topk_by, not a window: the map-side partial caps the shuffle at k
    // entries per query per task instead of every probed candidate
    val floor = SimilaritySearch.kthBestScore(
      pass1, queryIdCol, idCol, "sim", k, "floor_sim")
    // second pass: exactly the cells whose bound can still matter. >= on
    // the floor (not >): a bound-equal cell can hold a tie that wins the
    // ascending-id tie-break.
    val sel2 = qCells.filter(col("crank") > probeWidth)
      .join(floor, Seq(queryIdCol), "left")
      .filter(col("ub_sim") > threshold &&
        col("ub_sim") >= coalesce(col("floor_sim"), lit(threshold)))
    val pass2 = probe(sel2)

    val cand = pass1.unionByName(pass2)
    (cand.transform(SimilaritySearch.topKExplode(_, queryIdCol, idCol, "sim", k)),
      qCells.filter(col("crank") <= probeWidth)
        .select(col(queryIdCol), col("centroid_id"))
        .unionByName(sel2.select(col(queryIdCol), col("centroid_id")))
        .distinct(),
      cand)
  }

  /** Exact k-NN GRAPH over the indexed corpus: every vector's k nearest
    * neighbors (self excluded) by exact cosine — the dense-batch
    * retrieval pattern that semantic dedup (SemDeDup, Abbas et al.
    * 2023), graph-based clustering, and neighbor-graph embeddings all
    * start from.
    *
    * [[queryTopK]] broadcasts its query batch, which is right for point
    * lookups and wrong when the corpus IS the query batch; here nothing
    * broadcasts but the per-cell metadata (nCentroids rows):
    *
    *  - pass 1 ranks each vector against its OWN cell (an equi-self-join
    *    on the `centroid_id` partition column — co-located, quadratic
    *    only within a cell, which is exactly the cost profile
    *    cluster-then-compare dedup accepts on purpose);
    *  - the k-th best own-cell similarity seeds a per-vector floor;
    *  - pass 2 probes only foreign cells whose triangle bound
    *    (`sim <= 1 - max(0, d(q,c) - radius_c)^2 / 2`, unit vectors)
    *    can still beat that floor, via a shuffle equi-join on the probe
    *    cell id — each cell is read once per probing vector partition,
    *    never per vector.
    *
    * On a clustered corpus the floor is tight after pass 1 and foreign
    * probes are rare; on an isotropic one this degrades toward the full
    * self-join rather than silently dropping true neighbors (the same
    * exactness contract as [[queryTopK]]). Vectors alone in their cell
    * get floor = -1 and probe every cell — correctness never depends on
    * the layout.
    *
    * @return (query_id, idCol, sim, rn) — rn 1..k by exact sim desc,
    *         ties broken by ascending neighbor id
    */
  /** Corpus-side salted equi-join of a cell-pruned scan with a
    * per-(query, cell) probe-selection frame — the pass-2 shape shared
    * by [[selfKnnGraph]] and [[contrastivePairs]]. Joining on the bare
    * cell id caps shuffle-join parallelism at the PROBED cell count
    * (guide §2.5): the corpus side therefore carries a deterministic
    * id-hash salt and the (lighter, metadata-only) probe side explodes
    * across the salt range, so the join spreads over
    * probedCells × salt partitions. Result rows are identical — the
    * salt is an equality-preserving refinement of the key. Scale-
    * adaptive: salt = ⌈2·cores / probedCells⌉ collapses to 1 (the
    * unsalted plan, zero overhead) as soon as the probed-cell count
    * covers the session's parallelism, which any production-sized
    * index does.
    */
  private def saltedProbeJoin(
      corpus: DataFrame,
      probeSel: DataFrame,
      idCol: String,
      probedCellCount: Int,
      spark: SparkSession): DataFrame = {
    val cores = spark.sparkContext.defaultParallelism
    val salt =
      math.max(1, math.ceil(2.0 * cores / math.max(1, probedCellCount)).toInt)
    if (salt <= 1) corpus.join(probeSel, "centroid_id")
    else corpus
      .withColumn("__salt", pmod(hash(col(idCol)), lit(salt)))
      .join(probeSel.withColumn("__salt",
          explode(sequence(lit(0), lit(salt - 1)))),
        Seq("centroid_id", "__salt"))
      .drop("__salt")
  }

  def selfKnnGraph(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      k: Int): DataFrame = {
    ensureGeneration(spark, indexPath)
    val cellMeta = broadcast(spark.read.parquet(s"$indexPath/cells_meta"))
    // deleted rows leave the graph as nodes AND as neighbors
    val assigned = Tombstones.liveOnly(
      normalizedAssigned(spark, indexPath, idCol, embCol),
      spark, indexPath, idCol)
    val queries = assigned.select(
      col(idCol).as("query_id"), col(embCol).as("__qv"),
      col("centroid_id"), col("__norm").as("__qnorm"))
    val corpus = assigned.select(col(idCol), col(embCol), col("centroid_id"))

    def rank(cand: DataFrame): DataFrame = cand
      .withColumn("sim", cosine_sim(col("__qv"), col(embCol)))
      .select(col("query_id"), col(idCol), col("sim"))

    // pass 1: own cell, self excluded. Materialized once — it feeds the
    // floor AND the final union (the queryTopK discipline). The query
    // side sheds __qnorm BEFORE the join (guide §2.3): the ranking only
    // needs the raw vector, and the normalized copy would double the
    // width of every fan-out row for nothing (__qnorm exists for the
    // centroid-distance bound below, a queries × nCells frame).
    val pass1 = rank(
      queries.drop("__qnorm")
        .join(corpus, "centroid_id").filter(col("query_id") =!= col(idCol)))
      .localCheckpoint()
    // k-th best via topk_by: pass-1 is own-cell × corpus sized, so the
    // map-side partial (k per query per task) is the difference between
    // shuffling the candidate set and shuffling the answer
    val floor = SimilaritySearch.kthBestScore(
      pass1, "query_id", idCol, "sim", k, "floor_sim")

    // pass 2: foreign cells whose bound still reaches the floor. >= on
    // the floor: a bound-equal cell can hold a tie that wins the
    // ascending-id tie-break.
    val probeSel = queries
      .withColumnRenamed("centroid_id", "__own")
      .crossJoin(cellMeta)
      .filter(col("centroid_id") =!= col("__own"))
      .withColumn("cdist",
        sqrt(graft.functions.l2_dist_sq(col("__qnorm"), col("center"))))
      .withColumn("ub_sim",
        lit(1.0) - pow(
          greatest(lit(0.0), col("cdist") - col("radius") - lit(RadiusPad)), 2) / 2)
      .join(floor, Seq("query_id"), "left")
      .filter(col("ub_sim") >= coalesce(col("floor_sim"), lit(-1.0)))
      .select(col("query_id"), col("__qv"), col("centroid_id"))
    // foreign probes re-read the index pruned to the probed cells: the
    // distinct probed ids (≤ nCentroids, driver-bounded) become a
    // static partition filter, so on a clustered corpus — where pass-2
    // touches few cells — the second scan reads only those directories.
    // The id collection recomputes the (cheap, checkpointed-input)
    // selection COLUMN-PRUNED — materializing the vector-carrying probe
    // frame just to read its cell ids costs more than this recompute
    val probedIds = probeSel.select("centroid_id").distinct()
      .collect().map(_.get(0)).toSeq
    val prunedCorpus = Tombstones.liveOnly(
        spark.read.parquet(s"$indexPath/cells")
          .filter(col("centroid_id").isin(probedIds: _*)),
        spark, indexPath, idCol)
      .select(col(idCol), col(embCol), col("centroid_id"))
    // the probe join's key is the PROBED cell id set — on a clustered
    // corpus that is a handful of values (2 of 16 at the measured 0.125
    // probe fraction), which caps a shuffle join's parallelism at
    // |probedIds| tasks no matter the cluster size (guide §2.5's
    // low-cardinality-key hazard; measured: 2 tasks / 1.5 s wall on 32
    // cores). Salt the corpus side by a deterministic id hash and
    // explode the (lighter) probe side across the salt range; when the
    // probed-cell count already covers the session's parallelism the
    // salt collapses to 1 and the plan is the unsalted one.
    val pass2 = rank(saltedProbeJoin(
      prunedCorpus, probeSel, idCol, probedIds.size, spark))

    pass1.unionByName(pass2)
      .transform(SimilaritySearch.topKExplode(_, "query_id", idCol, "sim", k))
  }

  /** Contrastive PAIR MINING over the indexed corpus: for every vector,
    * its nearest SAME-label neighbor (the positive) and its nearest
    * DIFFERENT-label neighbor (the hard negative) — the mining step of
    * contrastive/metric training-data preparation, exact by the same
    * cell-radius bound as [[selfKnnGraph]].
    *
    * Pruning is PER SIDE via per-(cell, label) radii, derived at mining
    * time from the assigned rows (one tiny nCells×nLabels aggregation —
    * the index itself stays label-free):
    *
    *  - positive side: cell c is probed iff it HOLDS the query's label
    *    and the bound with radius(c, L) reaches the own-cell same-label
    *    best;
    *  - negative side: cell c is probed iff some other label exists in
    *    it and the bound with max-radius-over-other-labels reaches the
    *    own-cell different-label best (the bound is monotone in the
    *    radius, so the max radius among labels ≠ L bounds every
    *    different-label member — computed from a per-cell top-2 so no
    *    label×label product is ever formed).
    *
    * This strictly refines the earlier shared-floor criterion (one
    * whole-cell radius against the weaker of the two floors): every
    * per-side-probed cell is shared-floor-probed, and cells that only
    * the weak side kept alive are skipped. On high-label-count corpora
    * that is the difference between probing for a rare label everywhere
    * and probing only the cells that actually contain it.
    *
    * Vectors whose label has no second member keep their row with a
    * null positive side (left-join semantics), mirroring what a mining
    * job must surface rather than drop.
    *
    * @param labels (idCol, labelCol) frame — label source joined onto
    *               the index rows (the index itself stays label-free)
    * @return (query_id, labelCol, pos_id, pos_sim, neg_id, neg_sim)
    */
  def contrastivePairs(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      labels: DataFrame,
      labelCol: String): DataFrame =
    contrastivePairsWithProbes(spark, indexPath, idCol, embCol, labels, labelCol)._1

  /** [[contrastivePairs]] plus two LAZY diagnostic frames of probed
    * (query, cell) pairs — (result, perSidePairs, sharedFloorPairs).
    * The production path never evaluates the shared-floor frame; it
    * exists so the strictly-fewer-probes contract is spec-checkable.
    */
  private[graft] def contrastivePairsWithProbes(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      labels: DataFrame,
      labelCol: String): (DataFrame, DataFrame, DataFrame) = {
    ensureGeneration(spark, indexPath)
    val cellMeta = broadcast(spark.read.parquet(s"$indexPath/cells_meta"))
    // deleted rows mine no pair and serve as no positive/negative
    val assigned = Tombstones.liveOnly(
        normalizedAssigned(spark, indexPath, idCol, embCol),
        spark, indexPath, idCol)
      .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
    val queries = assigned.select(
      col(idCol).as("query_id"), col(embCol).as("__qv"),
      col("centroid_id"), col("__norm").as("__qnorm"),
      col(labelCol).as("__qlabel"))
    val corpus = assigned.select(col(idCol), col(embCol), col("centroid_id"),
      col(labelCol).as("__clabel"))

    def rank(cand: DataFrame): DataFrame = cand
      .withColumn("sim", cosine_sim(col("__qv"), col(embCol)))
      .select(col("query_id"), col(idCol), col("sim"),
        (col("__qlabel") === col("__clabel")).as("__same"))
    // __qnorm shed before the fan-out join (guide §2.3, the
    // [[selfKnnGraph]] rationale): ranking needs the raw vector and the
    // labels, never the normalized copy
    val pass1 = rank(
      queries.drop("__qnorm")
        .join(corpus, "centroid_id").filter(col("query_id") =!= col(idCol)))
      .localCheckpoint()
    // per-side own-cell bests; a missing side probes fully FOR THAT
    // SIDE. The floor only needs each side's best SIMILARITY, which is
    // a plain max — one partial-aggregating groupBy, no window, no
    // shuffle of the own-cell candidate set
    val floors = pass1
      .groupBy("query_id")
      .agg(
        max(when(col("__same"), col("sim"))).as("__fp"),
        max(when(!col("__same"), col("sim"))).as("__fn"))
      .select(col("query_id"),
        coalesce(col("__fp"), lit(-1.0)).as("floor_pos"),
        coalesce(col("__fn"), lit(-1.0)).as("floor_neg"))

    // per-(cell, label) radii ([[cellLabelRadii]]) — tiny, checkpointed
    // once for its two consumers
    val cellLabel = cellLabelRadii(assigned, cellMeta, labelCol)
      .localCheckpoint()
    // per-cell top-2 label radii: r_neg(c, L) = max radius among labels
    // ≠ L = r1 if the argmax label isn't L, else r2 (null when the cell
    // holds a single label)
    val wr = Window.partitionBy(col("centroid_id"))
      .orderBy(col("__rl").desc, col(labelCol).asc)
    val ranked = cellLabel.withColumn("__rn", row_number().over(wr))
    val negMeta = ranked.filter(col("__rn") === 1)
      .select(col("centroid_id"), col(labelCol).as("__l1"), col("__rl").as("__r1"))
      .join(ranked.filter(col("__rn") === 2)
        .select(col("centroid_id"), col("__rl").as("__r2")),
        Seq("centroid_id"), "left")

    def bound(radius: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      lit(1.0) - pow(
        greatest(lit(0.0), col("cdist") - radius - lit(RadiusPad)), 2) / 2

    // ONE row per (query, foreign cell) carrying both side criteria as
    // flags — a cell kept by either side probes exactly once (no
    // union, no distinct, no duplicated ranking work). Both metadata
    // joins are broadcasts of nCells×nLabels-sized frames.
    val base = queries
      .withColumnRenamed("centroid_id", "__own")
      .crossJoin(cellMeta)
      .filter(col("centroid_id") =!= col("__own"))
      .withColumn("cdist",
        sqrt(graft.functions.l2_dist_sq(col("__qnorm"), col("center"))))
      .join(floors, Seq("query_id"), "left")
      .join(broadcast(cellLabel.select(
          col("centroid_id").as("__cl_cell"),
          col(labelCol).as("__cl_label"), col("__rl"))),
        col("__cl_cell") === col("centroid_id") &&
          col("__cl_label") === col("__qlabel"), "left")
      .drop("__cl_cell", "__cl_label")
      .join(broadcast(negMeta), Seq("centroid_id"), "left")
      .withColumn("__rneg",
        when(col("__l1") =!= col("__qlabel"), col("__r1")).otherwise(col("__r2")))
      .withColumn("__pos_ok",
        col("__rl").isNotNull &&
          bound(col("__rl")) >= coalesce(col("floor_pos"), lit(-1.0)))
      .withColumn("__neg_ok",
        col("__rneg").isNotNull &&
          bound(col("__rneg")) >= coalesce(col("floor_neg"), lit(-1.0)))
    val probeSel = base.filter(col("__pos_ok") || col("__neg_ok"))
      .select(col("query_id"), col("__qv"), col("__qlabel"), col("centroid_id"))
    // same static-pruning discipline as [[selfKnnGraph]]: pass 2 reads
    // only the probed cell directories (labels re-attached to just
    // those rows); ids collected from a column-pruned recompute, never
    // a materialization of the vector-carrying probe frame
    val probedIds = probeSel.select("centroid_id").distinct()
      .collect().map(_.get(0)).toSeq
    val prunedCorpus = Tombstones.liveOnly(
        spark.read.parquet(s"$indexPath/cells")
          .filter(col("centroid_id").isin(probedIds: _*)),
        spark, indexPath, idCol)
      .select(col(idCol), col(embCol), col("centroid_id"))
      .join(labels.select(col(idCol), col(labelCol).as("__clabel")), Seq(idCol))
    // salted for parallelism — the [[saltedProbeJoin]] rationale (the
    // probed-cell count caps the join otherwise)
    val pass2 = rank(saltedProbeJoin(
      prunedCorpus, probeSel, idCol, probedIds.size, spark))

    // per-(query, side) argmax by (sim desc, id asc) as a k=1 topk_by —
    // map-side partials keep the union's candidate volume off the wire
    val best = pass1.unionByName(pass2)
      .groupBy(col("query_id"), col("__same"))
      .agg(graft.functions.topk_by(col(idCol), col("sim"), lit(1)).as("__t"))
      .select(col("query_id"), col("__same"),
        col("__t").getItem(0).getField("id").as(idCol),
        col("__t").getItem(0).getField("score").as("sim"))
    val pos = best.filter(col("__same"))
      .select(col("query_id"), col(idCol).as("pos_id"),
        round(col("sim"), 6).as("pos_sim"))
    val neg = best.filter(!col("__same"))
      .select(col("query_id"), col(idCol).as("neg_id"),
        round(col("sim"), 6).as("neg_sim"))
    val result = assigned.select(col(idCol).as("query_id"), col(labelCol))
      .join(pos, Seq("query_id"), "left")
      .join(neg, Seq("query_id"), "left")
      .select(col("query_id"), col(labelCol),
        col("pos_id"), col("pos_sim"), col("neg_id"), col("neg_sim"))

    // diagnostics (lazy): the per-side pairs actually probed, and what
    // the earlier shared-floor criterion (whole-cell radius vs the
    // weaker floor) WOULD have probed
    val perSidePairs = probeSel.select(col("query_id"), col("centroid_id"))
    val sharedFloorPairs = base
      .filter(bound(col("radius")) >=
        least(coalesce(col("floor_pos"), lit(-1.0)),
          coalesce(col("floor_neg"), lit(-1.0))))
      .select(col("query_id"), col("centroid_id"))
    (result, perSidePairs, sharedFloorPairs)
  }
}
