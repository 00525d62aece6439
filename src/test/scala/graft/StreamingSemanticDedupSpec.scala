package graft

import graft.streaming.StreamingSemanticDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic (cosine) admission: equality with the sequential greedy
  * fold, micro-batch split invariance, the chain-rule contrast with
  * batch SemDeDup, and occupancy-bounded index growth.
  */
class StreamingSemanticDedupSpec extends AnyFunSuite with SharedSpark {

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"semadm-$tag").toString

  /** Sequential admission fold over arrival order: reject iff an
    * ADMITTED earlier vector is τ-close (best = highest sim, tie
    * lowest id).
    */
  private def referenceVerdicts(
      rows: Seq[(Long, Array[Float])],
      tau: Double): Map[Long, (Boolean, Option[Long])] = {
    def cos(x: Array[Float], y: Array[Float]): Double =
      graft.functions.VectorOps.cosine(x, y)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    rows.sortBy(_._1).map { case (id, v) =>
      val hits = admitted.map { case (aid, av) => (aid, cos(v, av)) }
        .filter(_._2 >= tau)
      if (hits.isEmpty) {
        admitted += ((id, v))
        id -> ((true, None: Option[Long]))
      } else {
        val best = hits.maxBy(t => (t._2, -t._1))
        id -> ((false, Some(best._1)))
      }
    }.toMap
  }

  private def collectVerdicts(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id", "admitted", "dup_of").collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    }.toMap

  /** Clustered vectors with in-cluster duplicates: ~every third vector
    * is a near-copy of an earlier one.
    */
  private def feed(n: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(41)
    (0L until n).map { i =>
      val base = Array.fill(8)(0.0f)
      base((i % 4).toInt * 2) = 1.0f
      val noise = if (i % 3 == 2) 0.005f else 0.3f
      (i, base.map(x => x + (rnd.nextFloat() - 0.5f) * noise))
    }
  }

  test("an oversized micro-batch fails fast, pointing at the batch operator") {
    import spark.implicits._
    // the in-batch all-pairs check and the batch-sized replay-proof
    // probe are quadratic in batch size BY DESIGN — the ceiling turns
    // an oversized backfill into a clear error before any quadratic
    // work, not an OOM/grind mid-stream
    val big = spark.range(StreamingSemanticDedup.MaxBatchRows + 1)
      .select(col("id").as("vec_id"),
        array(lit(1.0f), lit(0.0f)).as("embedding"))
    val err = intercept[IllegalArgumentException] {
      StreamingSemanticDedup.admissionStep(big, tempDir("oversized"), tau = 0.99)
    }
    assert(err.getMessage.contains("SemanticDedup"))
  }

  test("one-shot admission equals the sequential greedy fold") {
    import spark.implicits._
    val rows = feed(90L)
    val got = collectVerdicts(StreamingSemanticDedup.admissionStep(
      rows.toDF("vec_id", "embedding"), tempDir("oneshot"), tau = 0.995))
    assert(got == referenceVerdicts(rows, 0.995))
    // sanity: the threshold actually bites both ways
    assert(got.values.exists(_._1) && got.values.exists(!_._1))
  }

  test("verdicts are invariant under micro-batch splits of the feed") {
    import spark.implicits._
    val rows = feed(90L)
    val whole = collectVerdicts(StreamingSemanticDedup.admissionStep(
      rows.toDF("vec_id", "embedding"), tempDir("whole"), tau = 0.995))
    val dir = tempDir("split")
    val cut = Seq(rows.slice(0, 31), rows.slice(31, 32), rows.slice(32, 90))
    val stepwise = cut.filter(_.nonEmpty).map(b =>
      collectVerdicts(StreamingSemanticDedup.admissionStep(
        b.toDF("vec_id", "embedding"), dir, tau = 0.995)))
      .reduce(_ ++ _)
    assert(stepwise == whole)
  }

  test("chain rule: a vector whose only neighbor was rejected IS admitted") {
    import spark.implicits._
    def rot(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // cos(A,B) = cos(B,C) ≈ 0.94 ≥ τ, cos(A,C) ≈ 0.77 < τ.
    // Admission: A admitted, B rejected (dup of A), C ADMITTED — its
    // only τ-neighbor B never entered the admitted set. (Batch
    // SemDeDup — q102 — drops C here; both semantics are deliberate,
    // see the operator scaladoc.)
    val rows = Seq((1L, rot(0)), (2L, rot(20)), (3L, rot(40)))
    val got = collectVerdicts(StreamingSemanticDedup.admissionStep(
      rows.toDF("vec_id", "embedding"), tempDir("chain"), tau = 0.9))
    assert(got(1L) == ((true, None)))
    assert(got(2L) == ((false, Some(1L))))
    assert(got(3L) == ((true, None)))
  }

  test("crash replay: same-batch poison rows cannot flip a rejection into an admit") {
    import spark.implicits._
    // τ = 0.9. Corpus: w=5 on e1 (plus a filler so the index builds).
    // Batch: v (24° from w: sim 0.914 ≥ τ — must be REJECTED as dup
    // of 5), u (20° from v in-plane: 0.940 to v, 0.719 to w), x (20°
    // from v out-of-plane: 0.940 to v, 0.859 to w, 0.883 to u).
    // Attempt 1 admits u and x and indexes them; a crash before the
    // fence then replays the batch — now u and x sit in the index at
    // sims ABOVE v's true match w, and a small-k probe would truncate
    // w away before the id filter drops the replayed copies, wrongly
    // ADMITTING v. The batch-sized probe keeps w reachable.
    def deg(d: Double) = math.toRadians(d)
    val w = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val filler = Array(0f, 0f, 0f, 0f, 0f, 1f, 0f, 0f)
    val v = Array(math.cos(deg(24)).toFloat, math.sin(deg(24)).toFloat,
      0f, 0f, 0f, 0f, 0f, 0f)
    val u = Array(math.cos(deg(44)).toFloat, math.sin(deg(44)).toFloat,
      0f, 0f, 0f, 0f, 0f, 0f)
    val c20 = math.cos(deg(20)).toFloat
    val x = Array(v(0) * c20, v(1) * c20, math.sin(deg(20)).toFloat,
      0f, 0f, 0f, 0f, 0f)
    val dir = tempDir("replay")
    graft.query.IvfIndex.build(
      Seq((5L, w), (6L, filler)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$dir/ivf",
      graft.query.IvfIndex.Params(nCentroids = 2))

    val batch = Seq((100L, v), (101L, u), (102L, x))
    val first = collectVerdicts(StreamingSemanticDedup.admissionStep(
      batch.toDF("vec_id", "embedding"), dir, tau = 0.9))
    assert(first == Map(
      100L -> ((false, Some(5L))), 101L -> ((true, None)), 102L -> ((true, None))))

    // the crash-window replay: same batch, index already holds u and x
    val replay = collectVerdicts(StreamingSemanticDedup.admissionStep(
      batch.toDF("vec_id", "embedding"), dir, tau = 0.9))
    assert(replay(100L) == ((false, Some(5L))),
      s"replay flipped v's rejection: ${replay(100L)}")
  }

  test("cold start with a single-vector first batch seeds, then builds") {
    import spark.implicits._
    def unit(dim: Int): Array[Float] =
      Array.tabulate(8)(d => if (d == dim) 1.0f else 0.0f)
    val dir = tempDir("coldstart")
    // batch 1: one vector — below the KMeans minimum, must stash
    val v1 = collectVerdicts(StreamingSemanticDedup.admissionStep(
      Seq((1L, unit(0))).toDF("vec_id", "embedding"), dir, tau = 0.9))
    assert(v1 == Map(1L -> ((true, None))))
    // batch 2: a copy of it (must be REJECTED against the seed) plus
    // two distinct vectors — enough to build the index
    val v2 = collectVerdicts(StreamingSemanticDedup.admissionStep(
      Seq((2L, unit(0)), (3L, unit(2)), (4L, unit(4)))
        .toDF("vec_id", "embedding"), dir, tau = 0.9))
    assert(v2 == Map(
      2L -> ((false, Some(1L))), 3L -> ((true, None)), 4L -> ((true, None))))
    // batch 3 probes the built index
    val v3 = collectVerdicts(StreamingSemanticDedup.admissionStep(
      Seq((5L, unit(2)), (6L, unit(6))).toDF("vec_id", "embedding"), dir, tau = 0.9))
    assert(v3 == Map(5L -> ((false, Some(3L))), 6L -> ((true, None))))
    assert(spark.read.parquet(s"$dir/ivf/cells")
      .select("vec_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 6L))
  }

  test("start() wires the fence; split cap bounds admitted-index cells") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = feed(120L)
    val dir = tempDir("stream")
    val ckpt = tempDir("stream-ckpt")
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingSemanticDedup.start(
      input.toDS().toDF("vec_id", "embedding"), dir, ckpt,
      tau = 0.995, splitCap = Some(30L))
    try {
      val (b1, rest) = rows.splitAt(40)
      val (b2, b3) = rest.splitAt(40)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
    } finally q.stop()

    val verdicts = collectVerdicts(spark.read.parquet(s"$dir/verdicts"))
    assert(verdicts == referenceVerdicts(rows, 0.995))

    // the admitted index holds exactly the admitted vectors, and the
    // split cap kept every cell at or under the bound
    val admitted = verdicts.filter(_._2._1).keySet
    val cells = spark.read.parquet(s"$dir/ivf/cells")
    assert(cells.select("vec_id").collect().map(_.getLong(0)).toSet == admitted)
    val sizes = cells.groupBy("centroid_id").count()
      .select("count").collect().map(_.getLong(0))
    assert(sizes.forall(_ <= 30L), s"split cap not enforced: ${sizes.toSeq}")

    // the shared replay fence recorded the applied batches (replay
    // no-op behavior itself is pinned in StreamingNearDupSpec /
    // IndexMaintenanceSpec over the identical wrapper shape)
    assert(graft.streaming.IndexMaintenance.lastApplied(spark, dir) >= 2L)
  }
}
