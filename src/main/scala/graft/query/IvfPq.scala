package graft.query

import graft.functions.cosine_sim
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF + PQ composed index — the canonical two-level ANN layout
  * (Jégou et al.'s IVFADC shape, TPAMI 2011; public method, no code
  * consulted): coarse KMeans cells prune whole PARTITION DIRECTORIES,
  * and within the probed cells a product-quantization code scan prunes
  * individual FETCHES. The two certified bounds stack:
  *
  *  - cell level ([[IvfIndex]]): for any member x of cell c,
  *    `sim(q,x) ≤ 1 − max(0, d(q,centroid_c) − radius_c)²/2` — cells
  *    whose bound cannot reach the floor are never read at all
  *    (static partition pruning on `centroid_id=`);
  *  - code level ([[PqIndex]]): within a probed cell, the ADC distance
  *    to the reconstructed vector ± the stored residual certifies
  *    `sim ∈ [lb, ub]` per vector — only bound-survivors fetch their
  *    full payload for the exact cosine re-rank.
  *
  * Retrieval is EXACT at any corpus shape, the family contract: the
  * floor is a k-th best certified LOWER bound, so nothing the bounds
  * discard could have been in the true top-k; poor clustering or poor
  * codebooks cost reads, never answers.
  *
  * 100 TB shape: a query batch reads the nCells-row metadata, the
  * codes of only the cells that survive the cell bound (a few numSub-
  * int rows per vector, partition-pruned at the source), and the full
  * payloads of only the vectors that survive the code bound. Neither
  * the codes nor the payload table ever shuffles — the query batch
  * broadcasts. Two encodings share the layout ([[Params.residual]]):
  * GLOBAL (default — codes priced against the raw vectors, one LUT
  * per query) and RESIDUAL (classic IVFADC — codes priced against
  * vector − centroid residuals through append-only encoding
  * generations, one LUT per (query, generation); far tighter bounds,
  * hence far smaller exact-verify fetches, on clustered corpora).
  * Both keep every code row self-consistent under maintenance —
  * global codes are cell-independent outright, residual codes carry
  * their generation — which is what lets [[splitHotCells]] move code
  * rows between partitions without re-encoding anything in either
  * mode.
  */
object IvfPq {

  /** `residual = true` selects per-cell RESIDUAL encoding — classic
    * IVFADC: codebooks are fit on (vector − cell centroid) residuals,
    * which are far more concentrated than the vectors themselves on a
    * clustered corpus, so the stored `resid` quantization error (and
    * with it the certified [lb, ub] width, and with THAT the
    * exact-verify fetch volume) shrinks. A cost refinement only: both
    * modes are EXACT by the same bound.
    *
    * Encoding generations: every code row carries the `enc_id` of the
    * center it was encoded against, resolved through an APPEND-ONLY
    * `enc_centers` table — the LUT is built per (query, enc), so a
    * code row stays self-consistent forever: splits MOVE rows without
    * re-encoding (exactly as in global mode), and upserts into a
    * re-centered or split-minted cell append a fresh generation
    * rather than touching anything. Center drift between a row's enc
    * generation and its cell's current centroid costs bound TIGHTNESS
    * (more fetches), never answers — [[reencodeCells]] restores it
    * (and [[stats]]' enc_drift column says when that pays), the
    * family's compact-when-it-pays discipline.
    */
  case class Params(
      ivf: IvfIndex.Params = IvfIndex.Params(),
      pq: PqIndex.Params = PqIndex.Params(),
      residual: Boolean = false)

  /** A residual-mode index is recognized on disk by its `enc_centers`
    * table — query and maintenance read the mode from the index, so a
    * caller cannot mismatch it.
    */
  private[graft] def isResidual(spark: SparkSession, indexPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/enc_centers")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Build = one [[IvfIndex.build]] (cells + radii metadata + the
    * payload table, parquet-partitioned by cell) + PQ codebooks fit
    * and a code table in the SAME cell-partitioned layout, so cell
    * pruning applies to the code scan too.
    */
  def build(
      df: DataFrame,
      idCol: String,
      embCol: String,
      outPath: String,
      params: Params = Params()): Unit = {
    val spark = df.sparkSession
    IvfIndex.build(df, idCol, embCol, outPath, params.ivf)
    if (!params.residual) {
      PqIndex.fitAndWriteCodebooks(df, idCol, embCol, outPath, params.pq)
      // encode every vector and co-partition the codes WITH their cell:
      // the cell-level bound then prunes code directories before a
      // single code is read
      val assignment = spark.read.parquet(s"$outPath/cells")
        .select(col(idCol), col("centroid_id"))
      PqIndex.encode(df, idCol, embCol, PqIndex.codebooksDf(spark, outPath), params.pq)
        .join(assignment, idCol)
        .transform(graft.util.PartitionedWrite.spread(
          _, params.ivf.nCentroids, col("centroid_id"), col(idCol)))
        .write.mode("overwrite").partitionBy("centroid_id")
        .parquet(s"$outPath/cell_codes")
    } else {
      // RESIDUAL mode ([[Params.residual]]): codebooks fit on
      // (normalized vector − cell centroid), codes priced against the
      // per-row generation center. Build-time generations are the
      // build centroids themselves: enc_id := centroid_id.
      val meta = spark.read.parquet(s"$outPath/cells_meta")
      // the residual frame is CORPUS-sized and feeds two consumers
      // (codebook fit, encode): spill it to a parquet temp table under
      // the index path instead of localCheckpoint — checkpoint blocks
      // are executor-resident and lineage-truncated, so at 100 TB one
      // lost executor (or memory pressure) kills the build; the
      // underscore prefix keeps every table reader from ever listing
      // it, and the finally deletes it win or lose
      val tmpResiduals = s"$outPath/_tmp_residuals"
      IvfIndex.normalizedAssigned(spark, outPath, idCol, embCol)
        .join(broadcast(meta.select(col("centroid_id"), col("center"))),
          "centroid_id")
        .withColumn("__res",
          zip_with(col("__norm"), col("center"),
            (a, b) => (a - b).cast("float")))
        .select(col(idCol), col("centroid_id"), col("__res"))
        .write.mode("overwrite").parquet(tmpResiduals)
      try {
        val residuals = spark.read.parquet(tmpResiduals)
        val fitInput = if (params.pq.fitSampleMod > 1)
          residuals.filter(
            pmod(hash(col(idCol)), lit(params.pq.fitSampleMod)) === 0)
        else residuals
        PqIndex.fitCodebooksFrom(
          PqIndex.subspaceRowsOf(fitInput, idCol, "__res", params.pq, Nil),
          idCol, outPath, params.pq)
        // enc tables FIRST (append-only; codes reference them) — the
        // residual-mode marker is the enc_centers table itself
        meta.select(col("centroid_id").cast("long").as("enc_id"), col("center"))
          .repartition(1)
          .write.mode("overwrite").parquet(s"$outPath/enc_centers")
        meta.select(col("centroid_id"),
            col("centroid_id").cast("long").as("enc_id"))
          .repartition(1)
          .write.mode("overwrite").parquet(s"$outPath/enc_current")
        PqIndex.encodePrepared(residuals, idCol, "__res",
            PqIndex.codebooksDf(spark, outPath), params.pq)
          .join(residuals.select(col(idCol), col("centroid_id")), idCol)
          .withColumn("enc_id", col("centroid_id").cast("long"))
          .transform(graft.util.PartitionedWrite.spread(
            _, params.ivf.nCentroids, col("centroid_id"), col(idCol)))
          .write.mode("overwrite").partitionBy("centroid_id")
          .parquet(s"$outPath/cell_codes")
      } finally {
        val p = new org.apache.hadoop.fs.Path(tmpResiduals)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
        ()
      }
    }
  }

  /** Incremental maintenance of the composed index: assign NEW vectors
    * to their nearest existing cell and append to `cells/` + grow radii
    * ([[IvfIndex.upsert]]), then encode them against the FROZEN
    * codebooks and append the codes to the same cell partitions. Both
    * bounds keep their contracts unconditionally (radius coverage;
    * residuals priced against the codebook actually stored), so the
    * upsert is result-invisible — q109's oracle-gated property. The
    * assignment is computed once more for the codes row (one broadcast
    * cross-join over the batch — cheaper than rereading the appended
    * cells), deterministic, so the two appends agree.
    */
  def upsert(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      newRows: DataFrame,
      params: Params = Params()): Unit = {
    IvfIndex.upsertCells(spark, indexPath, idCol, embCol, newRows)
    val cellMeta = spark.read.parquet(s"$indexPath/cells_meta")
    val nCells = cellMeta.count().toInt.max(1)
    val assignment = IvfIndex.assignNew(cellMeta, nCells, idCol, embCol, newRows)
      .select(col(idCol), col("centroid_id"))
    if (!isResidual(spark, indexPath)) {
      PqIndex.encode(newRows, idCol, embCol,
          PqIndex.codebooksDf(spark, indexPath), params.pq)
        .join(assignment, idCol)
        // spread by the LIVE cell count (read above), not the params'
        // nominal nCentroids — the caller's params need not match the
        // build and the count is already on hand
        .transform(graft.util.PartitionedWrite.spread(
          _, nCells, col("centroid_id"), col(idCol)))
        .write.mode("append").partitionBy("centroid_id")
        .parquet(s"$indexPath/cell_codes")
    } else {
      // RESIDUAL mode: encode against the assigned cell's CURRENT enc
      // generation; cells without one (minted by a split since the
      // last generation was recorded) get a fresh generation from
      // their current centroid. All driver collects are ≤ nCells
      // (the probe-pruning bound); the enc tables are written BEFORE
      // any code references them, so a crash between the writes
      // leaves at worst unreferenced generations, never a dangling
      // enc_id.
      val targets = assignment.select(col("centroid_id").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSet
      val have = spark.read.parquet(s"$indexPath/enc_current")
        .select(col("centroid_id").cast("long"))
        .collect().map(_.getLong(0)).toSet
      val missing = (targets -- have).toSeq.sorted
      if (missing.nonEmpty) {
        import spark.implicits._
        val maxEnc = spark.read.parquet(s"$indexPath/enc_centers")
          .agg(max(col("enc_id"))).head.getLong(0)
        val mintMap = missing.zipWithIndex
          .map { case (c, i) => (c, maxEnc + 1 + i) }
          .toDF("__cid", "__enc")
        val minted = cellMeta
          .join(broadcast(mintMap),
            col("centroid_id").cast("long") === col("__cid"))
          .localCheckpoint()
        minted.select(col("__enc").as("enc_id"), col("center"))
          .repartition(1).write.mode("append")
          .parquet(s"$indexPath/enc_centers")
        val updatedCur = spark.read.parquet(s"$indexPath/enc_current")
          .unionByName(minted.select(
            col("centroid_id").cast("long").as("centroid_id"),
            col("__enc").as("enc_id")))
          .select(col("centroid_id").cast("long").as("centroid_id"), col("enc_id"))
          .localCheckpoint()
        updatedCur.repartition(1).write.mode("overwrite")
          .parquet(s"$indexPath/enc_current")
      }
      val encCur = broadcast(spark.read.parquet(s"$indexPath/enc_current")
        .select(col("centroid_id").cast("long").as("__ecell"), col("enc_id")))
      val encCenters = broadcast(
        spark.read.parquet(s"$indexPath/enc_centers"))
      val prep = AnnIndex.prepared(
          newRows.dropDuplicates(Seq(idCol, embCol)), idCol, embCol)
        .select(col(idCol),
          org.apache.spark.ml.functions.vector_to_array(col("features"))
            .cast("array<float>").as("__norm"))
      val residuals = prep
        .join(assignment, idCol)
        .join(encCur, col("centroid_id").cast("long") === col("__ecell"))
        .join(encCenters, "enc_id")
        .withColumn("__res",
          zip_with(col("__norm"), col("center"),
            (a, b) => (a - b).cast("float")))
        .select(col(idCol), col("centroid_id"), col("enc_id"), col("__res"))
        .localCheckpoint()
      PqIndex.encodePrepared(residuals, idCol, "__res",
          PqIndex.codebooksDf(spark, indexPath), params.pq)
        .join(residuals.select(col(idCol), col("centroid_id"), col("enc_id")),
          idCol)
        .transform(graft.util.PartitionedWrite.spread(
          _, nCells, col("centroid_id"), col(idCol)))
        .write.mode("append").partitionBy("centroid_id")
        .parquet(s"$indexPath/cell_codes")
    }
  }

  /** Hot-cell split maintenance for the composed index — delegates to
    * [[IvfIndex.splitHotCells]], which moves the `cell_codes` rows
    * WITH their cells: only the partition key changes, in BOTH
    * encodings (global codes are cell-independent; residual codes
    * carry their enc generation, which the move preserves — a moved
    * row keeps pricing against the center it was encoded with).
    * Result-invisible by the stacked bounds' contracts; see the
    * crash-ordering story on [[IvfIndex.splitHotCells]]. This
    * completes the composed family's log-structured lifecycle: append
    * ([[upsert]]) → split → compact ([[compactIndex]]), no full
    * re-cluster anywhere.
    */
  def splitHotCells(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      occupancyCap: Long): IvfIndex.SplitReport =
    IvfIndex.splitHotCells(spark, indexPath, idCol, embCol, occupancyCap)

  /** [[splitHotCells]] looped to convergence — the occupancy-repair
    * step of [[graft.streaming.IndexMaintenance.maintainIvfPq]].
    */
  def splitToConvergence(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      occupancyCap: Long): Unit =
    IvfIndex.splitToConvergence(spark, indexPath, idCol, embCol, occupancyCap)

  /** Full RE-CLUSTER of the COMPOSED index with an atomic generation
    * swap — [[IvfIndex.recluster]]'s centroid-placement repair
    * extended to the whole composed artifact set: a fresh
    * [[build]] (cells, metadata, codebooks, codes, and in residual
    * mode the encoding-generation tables) runs from the live corpus
    * into `_regen/` while readers keep serving the old generation,
    * then every artifact swaps behind the shared
    * `recluster_pending` marker fence. The marker carries the
    * artifact LIST (written atomically), so a crashed swap replays
    * the same plan through [[IvfIndex.ensureGeneration]] — and the
    * commit purges generation artifacts the NEW layout does not use,
    * which is what makes re-clustering across encodings safe: a
    * residual→global re-cluster removes the old enc tables (else
    * [[isResidual]] would misread the fresh global codes — wrong LUT
    * pricing), and global→residual mints them fresh. Label metadata
    * invalidates first, as in the plain face. Result-invisible by
    * the stacked bounds' contracts (exact for any centroid set and
    * any codebook).
    */
  def recluster(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      params: Params = Params()): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/cell_codes")),
      "IvfPq.recluster: no cell_codes table — a plain IVF index " +
        "re-clusters through IvfIndex.recluster")
    IvfIndex.ensureGeneration(spark, indexPath)
    IvfIndex.invalidateLabelMeta(spark, indexPath)
    val regen = s"$indexPath/_regen"
    fs.delete(new org.apache.hadoop.fs.Path(regen), true)
    // LIVE corpus only — the composed re-cluster is a full rebuild, so
    // it doubles as the complete physical compaction of pending
    // deletes (the IvfIndex.recluster discipline)
    build(Tombstones.liveOnly(
        spark.read.parquet(s"$indexPath/cells"), spark, indexPath, idCol)
        .select(col(idCol), col(embCol)),
      idCol, embCol, regen, params)
    val artifacts = Seq("cells", "cells_meta", "cell_codes", "codebooks",
        "enc_centers", "enc_current")
      .filter(a => fs.exists(new org.apache.hadoop.fs.Path(s"$regen/$a")))
    // the marker-fenced swap also purges the (now spent) tombstone
    // table — see IvfIndex.recluster
    IvfIndex.commitGeneration(spark, indexPath, artifacts)
  }

  /** Compact cells and cell_codes off the query path (partition
    * layouts preserved, pruning unaffected).
    */
  def compactIndex(spark: SparkSession, indexPath: String): Seq[graft.util.Compaction.Report] =
    Seq(
      graft.util.Compaction.compact(spark, s"$indexPath/cells", Seq("centroid_id")),
      graft.util.Compaction.compact(spark, s"$indexPath/cell_codes", Seq("centroid_id")))

  /** Row deletion on the composed index — [[IvfIndex.delete]]
    * verbatim: one shared tombstone table masks the code row and the
    * payload row alike (every composed scan anti-joins it), and
    * [[compactTombstones]] rewrites both tables' affected directories.
    */
  def delete(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      ids: DataFrame): Unit =
    IvfIndex.delete(spark, indexPath, idCol, ids)

  /** Physical fold-in of pending deletes — [[IvfIndex
    * .compactTombstones]], which detects the `cell_codes` table and
    * moves the surviving code rows with their cells in the same pass.
    */
  def compactTombstones(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String): IvfIndex.DeleteCompactionReport =
    IvfIndex.compactTombstones(spark, indexPath, idCol, embCol)

  /** Maintenance diagnostics for the composed index —
    * [[IvfIndex.stats]] widened with the codes side: one row per cell,
    * (centroid_id, occupancy, radius, n_files, codes, code_files).
    * `codes != occupancy` is the operational desync signal: a crashed
    * split awaiting [[IvfIndex.repairPendingCodes]] (codes > occupancy
    * — stale duplicates) or a torn [[upsert]] (codes < occupancy —
    * cells appended, codes not; replay the batch). Two
    * partition-column scans + two ≤ nCells directory listings; run
    * off the query path.
    */
  def stats(spark: SparkSession, indexPath: String): DataFrame = {
    IvfIndex.ensureGeneration(spark, indexPath)
    import spark.implicits._
    val codeOcc = spark.read.parquet(s"$indexPath/cell_codes")
      .groupBy(col("centroid_id").cast("long").as("centroid_id"))
      .agg(count(lit(1)).as("codes"))
    val codeFiles = graft.util.PartitionFiles
      .counts(spark, s"$indexPath/cell_codes", "centroid_id")
      .toDF("centroid_id", "code_files")
    // FULL joins on the codes side: a crashed-early composed split
    // leaves fresh code directories with no cells_meta row, and a
    // meta-driven left join would drop exactly the rows that carry
    // the desync this report exists to surface (codes > 0 with
    // occupancy 0)
    val base = IvfIndex.stats(spark, indexPath)
      .join(codeOcc, Seq("centroid_id"), "full")
      .join(codeFiles, Seq("centroid_id"), "full")
      .select(col("centroid_id"),
        coalesce(col("occupancy"), lit(0L)).as("occupancy"),
        col("radius"),
        coalesce(col("n_files"), lit(0L)).as("n_files"),
        coalesce(col("codes"), lit(0L)).as("codes"),
        coalesce(col("code_files"), lit(0L)).as("code_files"))
    if (!isResidual(spark, indexPath)) base
    else {
      // residual mode: generation-drift visibility per cell —
      // `generations` = distinct enc generations among the cell's
      // rows, `enc_drift` = max distance between the cell's CURRENT
      // centroid and a generation center its rows still price
      // against. Drift loosens the residual bounds (more fetches,
      // never wrong answers); [[reencodeCells]] when it grows. The
      // per-(cell, generation) aggregation is distinct-pair-sized —
      // ≤ nCells × nGenerations rows, no payload bytes.
      val meta = spark.read.parquet(s"$indexPath/cells_meta")
        .select(col("centroid_id").cast("long").as("centroid_id"),
          col("center").as("__cur"))
      val drift = spark.read.parquet(s"$indexPath/cell_codes")
        .select(col("centroid_id").cast("long").as("centroid_id"), col("enc_id"))
        .distinct()
        .join(broadcast(spark.read.parquet(s"$indexPath/enc_centers")), "enc_id")
        .join(broadcast(meta), "centroid_id")
        .withColumn("__d",
          sqrt(graft.functions.l2_dist_sq(col("center"), col("__cur"))))
        .groupBy("centroid_id")
        .agg(countDistinct(col("enc_id")).as("generations"),
          max(col("__d")).as("enc_drift"))
      base.join(drift, Seq("centroid_id"), "left")
        .select(base.columns.map(col) :+
          coalesce(col("generations"), lit(0L)).as("generations") :+
          coalesce(col("enc_drift"), lit(0.0)).as("enc_drift"): _*)
    }
  }

  /** Re-encode the codes of the given cells (default: every cell)
    * against their CURRENT centroids under a single fresh generation —
    * the tightness-restore op residual mode needs once generation
    * drift accumulates (splits re-center cells; moved rows keep
    * pricing against the center they were encoded with). Off the
    * query path, result-invisible at every point: until a partition's
    * overwrite commits its rows price against their old generations,
    * after it against the new one, and the per-(query, generation)
    * LUT covers both. Cost: one pruned scan of the selected cells'
    * payloads + encode + a dynamic overwrite of only their code
    * directories. The mid-write kill window of the dynamic overwrite
    * is the family's accepted residual (as for compaction and the
    * split); enc appends before any code references them.
    */
  def reencodeCells(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      params: Params = Params(),
      cells: Option[Seq[Long]] = None): Unit = {
    import spark.implicits._
    IvfIndex.ensureGeneration(spark, indexPath)
    require(isResidual(spark, indexPath),
      "IvfPq.reencodeCells: a global-codebook index has no generations to " +
        "re-encode — rebuild to refit its codebooks")
    val meta = spark.read.parquet(s"$indexPath/cells_meta")
    val targets = cells.getOrElse(
      meta.select(col("centroid_id").cast("long"))
        .collect().map(_.getLong(0)).toSeq).sorted
    if (targets.isEmpty) return
    // one fresh generation per target cell, minted from the current
    // centroid; enc tables first (append-only, codes reference them)
    val maxEnc = spark.read.parquet(s"$indexPath/enc_centers")
      .agg(max(col("enc_id"))).head.getLong(0)
    val mintMap = targets.zipWithIndex
      .map { case (c, i) => (c, maxEnc + 1 + i) }
      .toDF("__cid", "__enc")
    val minted = meta
      .join(broadcast(mintMap), col("centroid_id").cast("long") === col("__cid"))
      .localCheckpoint()
    minted.select(col("__enc").as("enc_id"), col("center"))
      .repartition(1).write.mode("append").parquet(s"$indexPath/enc_centers")
    val updatedCur = spark.read.parquet(s"$indexPath/enc_current")
      .select(col("centroid_id").cast("long").as("centroid_id"), col("enc_id"))
      .filter(!col("centroid_id").isin(targets: _*))
      .unionByName(minted.select(
        col("centroid_id").cast("long").as("centroid_id"),
        col("__enc").as("enc_id")))
      .localCheckpoint()
    updatedCur.repartition(1).write.mode("overwrite")
      .parquet(s"$indexPath/enc_current")
    // pruned payload scan of the target cells, residual vs the CURRENT
    // centroid, frozen-codebook encode, dynamic overwrite of only the
    // target code directories
    val members = IvfIndex.normalizedAssigned(spark, indexPath, idCol, embCol)
      .filter(col("centroid_id").isin(targets: _*))
    val residuals = members
      .join(broadcast(minted.select(
          col("centroid_id"), col("center"), col("__enc").as("enc_id"))),
        Seq("centroid_id"))
      .withColumn("__res",
        zip_with(col("__norm"), col("center"), (a, b) => (a - b).cast("float")))
      .select(col(idCol), col("centroid_id"), col("enc_id"), col("__res"))
      .localCheckpoint()
    PqIndex.encodePrepared(residuals, idCol, "__res",
        PqIndex.codebooksDf(spark, indexPath), params.pq)
      .join(residuals.select(col(idCol), col("centroid_id"), col("enc_id")), idCol)
      .transform(graft.util.PartitionedWrite.spread(
        _, targets.size, col("centroid_id"), col(idCol)))
      .write.mode("overwrite").partitionBy("centroid_id")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(s"$indexPath/cell_codes")
    // retire superseded generations: without this every re-encode
    // grows enc_centers (and with it the per-query LUT work of EVERY
    // future query) without bound. Referenced = generations a code
    // row still prices against ∪ each cell's current generation
    // (tomorrow's upsert targets); the rewrite runs AFTER the code
    // overwrite commits, so a crash in between strands extra
    // generations (harmless), never a dangling reference.
    val referenced = spark.read.parquet(s"$indexPath/cell_codes")
      .select(col("enc_id")).distinct()
      .unionByName(
        spark.read.parquet(s"$indexPath/enc_current").select(col("enc_id")))
      .distinct()
    val prunedEnc = spark.read.parquet(s"$indexPath/enc_centers")
      .join(referenced, "enc_id").localCheckpoint()
    prunedEnc.repartition(1).write.mode("overwrite")
      .parquet(s"$indexPath/enc_centers")
  }

  /** The observe→repair loop of residual mode, CLOSED: re-encode
    * exactly the cells whose encoding-generation drift (max distance
    * between a generation center a cell's rows still price against
    * and the cell's CURRENT centroid — [[stats]]' `enc_drift`)
    * exceeds `cap`, and return them. A global-codebook index (no
    * generations) and a drift-free index are both no-ops, so
    * maintenance can call this unconditionally at batch cadence:
    * the detection pass reads only the codes table's (cell, enc)
    * column pairs (distinct-pair-sized, no payload bytes) plus the
    * two tiny enc/meta tables, and the repair prices only the
    * drifted cells ([[reencodeCells]]'s pruned shape). Result-
    * invisible end to end — drift costs fetch volume, never answers,
    * and the re-encode only restores bound tightness.
    */
  def reencodeDrifted(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      params: Params = Params(),
      cap: Double = 0.0): Seq[Long] = {
    IvfIndex.ensureGeneration(spark, indexPath)
    if (!isResidual(spark, indexPath)) return Nil
    val meta = spark.read.parquet(s"$indexPath/cells_meta")
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("center").as("__cur"))
    // ≤ nCells ids reach the driver (the probe-pruning collect bound)
    val drifted = spark.read.parquet(s"$indexPath/cell_codes")
      .select(col("centroid_id").cast("long").as("centroid_id"), col("enc_id"))
      .distinct()
      .join(broadcast(spark.read.parquet(s"$indexPath/enc_centers")), "enc_id")
      .join(broadcast(meta), "centroid_id")
      .withColumn("__d",
        sqrt(graft.functions.l2_dist_sq(col("center"), col("__cur"))))
      .groupBy("centroid_id")
      .agg(max(col("__d")).as("__drift"))
      .filter(col("__drift") > cap)
      .select(col("centroid_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    if (drifted.nonEmpty)
      reencodeCells(spark, indexPath, idCol, embCol, params, Some(drifted))
    drifted
  }

  /** Batch top-k, exact by the stacked bounds. Output:
    * (queryIdCol, idCol, sim, rn) — the shared retrieval shape.
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
      probeWidth: Int = 1,
      params: Params = Params()): DataFrame =
    queryTopKWithDiag(spark, indexPath, idCol, embCol, queries,
      queryIdCol, queryVecCol, k, threshold, probeWidth, params)._1

  /** [[queryTopK]] plus two LAZY diagnostic frames: the (query, cell)
    * pairs whose codes were scanned, and the (query, id) candidates
    * that survived to the exact fetch — the two pruning levels,
    * spec-checkable independently.
    */
  private[graft] def queryTopKWithDiag(
      spark: SparkSession,
      indexPath: String,
      idCol: String,
      embCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      k: Int,
      threshold: Double,
      probeWidth: Int = 1,
      params: Params = Params()): (DataFrame, DataFrame, DataFrame) = {
    // one fs.exists when healthy: completes a crashed recluster swap
    IvfIndex.ensureGeneration(spark, indexPath)
    val pad = lit(1e-6)
    val cellMeta = broadcast(spark.read.parquet(s"$indexPath/cells_meta"))
    val residualMode = isResidual(spark, indexPath)
    val qNorm = AnnIndex.prepared(
        queries.select(col(queryIdCol), col(queryVecCol).as("__qv")),
        queryIdCol, "__qv")
      .select(col(queryIdCol), col("__qv"),
        org.apache.spark.ml.functions.vector_to_array(col("features"))
          .cast("array<float>").as("__qnorm"))
    // the ADC lookup tables: global mode prices every code against one
    // LUT per query; residual mode prices a code against the LUT of
    // ITS encoding generation — one LUT per (query, enc_id), built
    // from q − enc_center over the append-only enc_centers table
    // (queries × nEnc rows, broadcast-sized by the point-lookup
    // contract)
    val lutq =
      if (!residualMode)
        PqIndex.queryLut(spark, indexPath, queries, queryIdCol, queryVecCol, params.pq)
      else
        PqIndex.lutOf(
          qNorm.crossJoin(broadcast(spark.read.parquet(s"$indexPath/enc_centers")))
            .withColumn("__qdiff",
              zip_with(col("__qnorm"), col("center"),
                (a, b) => (a - b).cast("float"))),
          Seq(queryIdCol, "enc_id"), "__qdiff",
          PqIndex.codebooksDf(spark, indexPath), params.pq)
    val lutKeys = if (!residualMode) Seq(queryIdCol) else Seq(queryIdCol, "enc_id")

    // per (query, cell): probe order + the cell-level bound
    val wCent = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cdist").asc, col("centroid_id").asc)
    val qCells = qNorm.crossJoin(cellMeta)
      .withColumn("cdist",
        sqrt(graft.functions.l2_dist_sq(col("__qnorm"), col("center"))))
      .withColumn("cell_ub",
        lit(1.0) - pow(
          greatest(lit(0.0), col("cdist") - col("radius") - pad), 2) / 2)
      .withColumn("crank", row_number().over(wCent))
      .select(col(queryIdCol), col("centroid_id"), col("cell_ub"), col("crank"))

    val codes = spark.read.parquet(s"$indexPath/cell_codes")
    // ADC-scan the codes of the selected (query, cell) pairs — the
    // IvfIndex static-pruning discipline: probed cell ids (≤ nCells,
    // driver-bounded) become a planning-time partition filter
    def scan(sel: DataFrame): DataFrame = {
      val selM = sel.select(col(queryIdCol), col("centroid_id")).localCheckpoint()
      val probed = selM.select("centroid_id").distinct()
        .collect().map(_.get(0)).toSeq
      // tombstones mask at the CODE scan — before the lb floors this
      // pass seeds (a deleted row's lb could certify a cutoff above a
      // live row's true rank; see [[Tombstones]]), and before any LUT
      // work is spent on a row that cannot be served
      Tombstones.liveOnly(
          codes.filter(col("centroid_id").isin(probed: _*)),
          spark, indexPath, idCol)
        .join(broadcast(selM), Seq("centroid_id"))
        .join(broadcast(lutq), lutKeys)
        .withColumn("__adc", sqrt(graft.functions.pq_adc(col("codes"), col("__lut"))))
        .withColumn("__lb",
          lit(1.0) - pow(col("__adc") + col("resid") + pad, 2) / 2)
        .withColumn("__ub",
          lit(1.0) - pow(
            greatest(lit(0.0), col("__adc") - col("resid") - pad), 2) / 2)
        .select(col(queryIdCol), col(idCol), col("centroid_id"),
          col("__lb"), col("__ub"))
    }

    // pass 1: nearest probeWidth cells seed the floor
    val pass1 = scan(qCells.filter(col("crank") <= probeWidth)).localCheckpoint()
    val floor1 = SimilaritySearch.kthBestScore(
      pass1.select(col(queryIdCol), col(idCol), col("__lb").as("s")),
      queryIdCol, idCol, "s", k, "floor1")
    // pass 2: only cells whose CELL bound reaches the certified floor
    val sel2 = qCells.filter(col("crank") > probeWidth)
      .join(floor1, Seq(queryIdCol), "left")
      .filter(col("cell_ub") > threshold &&
        col("cell_ub") >= coalesce(col("floor1"), lit(threshold)))
    val scanned = pass1.unionByName(scan(sel2)).localCheckpoint()

    // final floor over everything scanned; fetch only code-bound
    // survivors
    val floor = SimilaritySearch.kthBestScore(
      scanned.select(col(queryIdCol), col(idCol), col("__lb").as("s")),
      queryIdCol, idCol, "s", k, "floor_lb")
    val cand = scanned
      .join(floor, Seq(queryIdCol), "left")
      .filter(col("__ub") > threshold &&
        col("__ub") >= coalesce(col("floor_lb"), lit(threshold)))
      .select(col(queryIdCol), col(idCol), col("centroid_id"))

    // exact re-rank: payloads read pruned to the candidates' cells.
    // Inside a split's commit window (and in a crashed split's state
    // until repair) a stale code copy can surface the same vector
    // from two cells — old and new directory both probed — and a
    // duplicate candidate would occupy two ranks of the final top-k,
    // displacing a true neighbor. The split_pending marker EXACTLY
    // brackets that window (written before any code moves, cleared
    // after the shrink / by repair), so the (query, id) dedup is
    // applied only while it exists: a healthy index pays nothing, a
    // racing or crashed-state query pays one candidate-sized
    // exchange for a correct result shape. Floor inflation from the
    // duplicate's lb rows remains the documented transient weakening
    // until repair.
    val mp = new org.apache.hadoop.fs.Path(s"$indexPath/split_pending")
    val inSplitWindow = mp.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(mp)
    val candM = cand.localCheckpoint()
    val fetchCells = candM.select("centroid_id").distinct()
      .collect().map(_.get(0)).toSeq
    val candPairs = candM.select(col(queryIdCol), col(idCol))
    val result = spark.read.parquet(s"$indexPath/cells")
      .filter(col("centroid_id").isin(fetchCells: _*))
      .select(col(idCol), col(embCol))
      .join(if (inSplitWindow) candPairs.distinct() else candPairs, idCol)
      .join(broadcast(qNorm.select(col(queryIdCol), col("__qv"))), queryIdCol)
      .withColumn("sim", cosine_sim(col("__qv"), col(embCol)))
      .filter(col("sim") > threshold)
      .select(col(queryIdCol), col(idCol), col("sim"))
      .transform(SimilaritySearch.topKExplode(_, queryIdCol, idCol, "sim", k))
    (result,
      scanned.select(col(queryIdCol), col("centroid_id")).distinct(),
      candM.select(col(queryIdCol), col(idCol)).distinct())
  }

  /** FILTERED batch top-k over the COMPOSED index — the
    * [[IvfIndex.queryTopKFiltered]] semantics (per-query top-k among
    * only the corpus rows carrying the query's label) served from the
    * memory-bound IVF+PQ layout, exact by the label-radius bound
    * STACKED with the code bound:
    *
    *  - cell level: a query probes only cells that actually CONTAIN
    *    its label, and only those whose per-(cell, label) radius bound
    *    (`sim ≤ 1 − max(0, d(q,c) − r(c,L))²/2`) can still reach the
    *    certified floor — the same metadata as the plain filtered
    *    path, shared verbatim: the persisted
    *    [[IvfIndex.buildLabelMeta]] artifact (the composed layout
    *    keeps `cells/` + `cells_meta` at the same paths, so freshness
    *    proofs, upsert folds and build invalidation all apply
    *    unchanged), else the per-call derivation;
    *  - code level: within a probed cell the ADC scan prices ONLY
    *    label-mates (corpus labels attached to the pruned code rows
    *    before any LUT work), certifying `sim ∈ [lb, ub]` per mate;
    *    the floor is the k-th best certified lb among mates, and only
    *    bound-survivors fetch their full payload for the exact
    *    re-rank — which needs no label re-check, candidates are
    *    mates by construction.
    *
    * High-cardinality labels branch to the shared overfetch fallback
    * ([[IvfIndex.filteredViaOverfetch]]) with THIS index's
    * [[queryTopK]] as the refill engine, so every read in the fallback
    * is code-bound-pruned too; the escalation equijoin reads the
    * shared payload table. Exact on every path — the branch is a cost
    * knob, never a semantics one (the q108/q113/q114 contract).
    *
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
      refillCap: Long = 65536L,
      params: Params = Params()): DataFrame =
    queryTopKFilteredWithPath(spark, indexPath, idCol, embCol, queries,
      queryIdCol, queryVecCol, labels, labelCol, k, threshold, probeWidth,
      maxLabelFanout, refillCap, params)._1

  /** MULTI-LABEL (disjunctive) filtered top-k over the COMPOSED index
    * — [[IvfIndex.queryTopKFilteredAny]]'s `label IN (...)` semantics
    * served from the memory-bound layout: the same containment
    * reduction (per-label exact retrievals unioned, one global
    * re-rank) over THIS index's [[queryTopKFiltered]] engine, so the
    * code-bound pruning and the fallback branch apply per unit.
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
      refillCap: Long = 65536L,
      params: Params = Params()): DataFrame =
    IvfIndex.filteredAnyVia(queries, queryIdCol, queryVecCol, labelSetCol,
      labelCol, idCol, k,
      ex => queryTopKFiltered(spark, indexPath, idCol, embCol, ex,
        "__fq", queryVecCol, labels, labelCol, k, threshold, probeWidth,
        maxLabelFanout, refillCap, params))

  /** [[queryTopKFiltered]] plus which path ran (`true` = the
    * high-cardinality overfetch fallback) — the branch decision,
    * spec-checkable. Branch rule identical to the plain index's: the
    * fresh persisted artifact's row count when present
    * (parquet-metadata-only), else `approx_count_distinct(label)`.
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
      refillCap: Long = 65536L,
      params: Params = Params()): (DataFrame, Boolean) = {
    IvfIndex.ensureGeneration(spark, indexPath)
    val cached = IvfIndex.cachedLabelRadii(spark, indexPath, labelCol)
    val fanout = cached.map(_.count()).getOrElse(
      labels.agg(approx_count_distinct(col(labelCol))).head.getLong(0))
    if (fanout > maxLabelFanout)
      (IvfIndex.filteredViaOverfetch(spark, indexPath, idCol, embCol, queries,
        queryIdCol, queryVecCol, labels, labelCol, k, threshold, probeWidth,
        refillCap,
        Some((pending: DataFrame, kk: Int) =>
          queryTopK(spark, indexPath, idCol, embCol, pending,
            queryIdCol, queryVecCol, kk, threshold, probeWidth, params))), true)
    else
      (filteredWithDiag(spark, indexPath, idCol, embCol, queries,
        queryIdCol, queryVecCol, labels, labelCol, k, threshold, probeWidth,
        cached, params)._1, false)
  }

  /** The label-radius path of [[queryTopKFiltered]], plus a LAZY
    * diagnostic frame of the (query, cell) pairs whose codes were
    * scanned — the label-driven probe restriction, spec-checkable.
    */
  private[graft] def filteredWithDiag(
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
      cached: Option[DataFrame],
      params: Params): (DataFrame, DataFrame) = {
    val pad = lit(1e-6)
    val cellMeta = broadcast(spark.read.parquet(s"$indexPath/cells_meta"))
    val residualMode = isResidual(spark, indexPath)
    // per-(cell, label) radii: the persisted artifact when provably
    // fresh, else derived per call (cost fallback, never correctness)
    val cellLabel = cached.getOrElse {
      // live rows only — the IvfIndex.filteredViaLabelRadii discipline
      val assigned = Tombstones.liveOnly(
          IvfIndex.normalizedAssigned(spark, indexPath, idCol, embCol),
          spark, indexPath, idCol)
        .join(labels.select(col(idCol), col(labelCol)), Seq(idCol))
      IvfIndex.cellLabelRadii(assigned, cellMeta, labelCol).localCheckpoint()
    }

    val qNorm = AnnIndex.prepared(
        queries.select(col(queryIdCol), col(queryVecCol).as("__qv")),
        queryIdCol, "__qv")
      .join(queries.select(col(queryIdCol), col(labelCol)), Seq(queryIdCol))
      .select(col(queryIdCol), col("__qv"), col(labelCol),
        org.apache.spark.ml.functions.vector_to_array(col("features"))
          .cast("array<float>").as("__qnorm"))
    // ADC LUTs — same construction as [[queryTopKWithDiag]]: one per
    // query (global) or one per (query, enc generation) (residual)
    val lutq =
      if (!residualMode)
        PqIndex.queryLut(spark, indexPath,
          queries.select(col(queryIdCol), col(queryVecCol)),
          queryIdCol, queryVecCol, params.pq)
          .select(col(queryIdCol), col("__lut"))
      else
        PqIndex.lutOf(
          qNorm.crossJoin(broadcast(spark.read.parquet(s"$indexPath/enc_centers")))
            .withColumn("__qdiff",
              zip_with(col("__qnorm"), col("center"),
                (a, b) => (a - b).cast("float"))),
          Seq(queryIdCol, "enc_id"), "__qdiff",
          PqIndex.codebooksDf(spark, indexPath), params.pq)
    val lutKeys = if (!residualMode) Seq(queryIdCol) else Seq(queryIdCol, "enc_id")

    // per (query, label-holding cell): probe order + label-radius bound.
    // The cellLabel join restricts the frame to cells that CONTAIN the
    // query's label — rare labels probe almost nowhere at any geometry
    val wCent = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cdist").asc, col("centroid_id").asc)
    val qCells = qNorm
      .join(broadcast(cellLabel), Seq(labelCol))
      .join(cellMeta.select(col("centroid_id"), col("center")), Seq("centroid_id"))
      .withColumn("cdist",
        sqrt(graft.functions.l2_dist_sq(col("__qnorm"), col("center"))))
      .withColumn("cell_ub",
        lit(1.0) - pow(
          greatest(lit(0.0), col("cdist") - col("__rl") - pad), 2) / 2)
      .withColumn("crank", row_number().over(wCent))
      .select(col(queryIdCol), col(labelCol), col("centroid_id"),
        col("cell_ub"), col("crank"))

    val codes = spark.read.parquet(s"$indexPath/cell_codes")
    val corpLab = labels.select(col(idCol), col(labelCol).as("__clabel"))
    // ADC-scan only the LABEL-MATES inside the selected (query, cell)
    // pairs: probed cell ids (≤ nCells, driver-bounded) become a
    // planning-time partition filter; corpus labels attach to just the
    // pruned code rows, and the mate filter runs BEFORE any LUT work
    def scan(sel: DataFrame): DataFrame = {
      val selM = sel.select(col(queryIdCol), col(labelCol), col("centroid_id"))
        .localCheckpoint()
      val probed = selM.select("centroid_id").distinct()
        .collect().map(_.get(0)).toSeq
      // tombstones mask before the mate filter and the lb floors —
      // the queryTopKWithDiag scan discipline
      Tombstones.liveOnly(
          codes.filter(col("centroid_id").isin(probed: _*)),
          spark, indexPath, idCol)
        .join(corpLab, Seq(idCol))
        .join(broadcast(selM), Seq("centroid_id"))
        .filter(col("__clabel") === col(labelCol))
        .join(broadcast(lutq), lutKeys)
        .withColumn("__adc", sqrt(graft.functions.pq_adc(col("codes"), col("__lut"))))
        .withColumn("__lb",
          lit(1.0) - pow(col("__adc") + col("resid") + pad, 2) / 2)
        .withColumn("__ub",
          lit(1.0) - pow(
            greatest(lit(0.0), col("__adc") - col("resid") - pad), 2) / 2)
        .select(col(queryIdCol), col(idCol), col("centroid_id"),
          col("__lb"), col("__ub"))
    }

    // pass 1: nearest probeWidth label-holding cells seed the floor
    val pass1 = scan(qCells.filter(col("crank") <= probeWidth)).localCheckpoint()
    val floor1 = SimilaritySearch.kthBestScore(
      pass1.select(col(queryIdCol), col(idCol), col("__lb").as("s")),
      queryIdCol, idCol, "s", k, "floor1")
    // pass 2: only label-holding cells whose LABEL-radius bound reaches
    // the certified floor
    val sel2 = qCells.filter(col("crank") > probeWidth)
      .join(floor1, Seq(queryIdCol), "left")
      .filter(col("cell_ub") > threshold &&
        col("cell_ub") >= coalesce(col("floor1"), lit(threshold)))
    val scanned = pass1.unionByName(scan(sel2)).localCheckpoint()

    // final floor over every scanned mate; fetch only code-bound
    // survivors — already label-filtered, the re-rank needs no re-check
    val floor = SimilaritySearch.kthBestScore(
      scanned.select(col(queryIdCol), col(idCol), col("__lb").as("s")),
      queryIdCol, idCol, "s", k, "floor_lb")
    val cand = scanned
      .join(floor, Seq(queryIdCol), "left")
      .filter(col("__ub") > threshold &&
        col("__ub") >= coalesce(col("floor_lb"), lit(threshold)))
      .select(col(queryIdCol), col(idCol), col("centroid_id"))

    // exact re-rank on payloads pruned to the candidates' cells; the
    // (query, id) dedup applies only inside a split's commit window —
    // same discipline and rationale as [[queryTopKWithDiag]]
    val mp = new org.apache.hadoop.fs.Path(s"$indexPath/split_pending")
    val inSplitWindow = mp.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(mp)
    val candM = cand.localCheckpoint()
    val fetchCells = candM.select("centroid_id").distinct()
      .collect().map(_.get(0)).toSeq
    val candPairs = candM.select(col(queryIdCol), col(idCol))
    val result = spark.read.parquet(s"$indexPath/cells")
      .filter(col("centroid_id").isin(fetchCells: _*))
      .select(col(idCol), col(embCol))
      .join(if (inSplitWindow) candPairs.distinct() else candPairs, idCol)
      .join(broadcast(qNorm.select(col(queryIdCol), col("__qv"))), queryIdCol)
      .withColumn("sim", cosine_sim(col("__qv"), col(embCol)))
      .filter(col("sim") > threshold)
      .select(col(queryIdCol), col(idCol), col("sim"))
      .transform(SimilaritySearch.topKExplode(_, queryIdCol, idCol, "sim", k))
    (result, scanned.select(col(queryIdCol), col("centroid_id")).distinct())
  }
}
