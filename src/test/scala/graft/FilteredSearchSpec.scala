package graft

import graft.query.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Attribute-filtered retrieval (q108's operator): exactness against
  * the label-restricted brute force, label-driven probe restriction,
  * and the empty-label edge.
  */
class FilteredSearchSpec extends AnyFunSuite with SharedSpark {

  private def topkSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("rn").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("filtered top-k equals the label-restricted brute force (fixture)") {
    val e = Tables(spark, Sf0001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-filt-fix").toString
    IvfIndex.build(e.select("vec_id", "embedding"), "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 8))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label"))
    val got = IvfIndex.queryTopKFiltered(spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", e.select("vec_id", "label"), "label",
      k = 5, threshold = 0.0)
    // brute force restricted to label-mates per query
    val exact = e.select(col("vec_id"), col("embedding"), col("label").as("__cl"))
      .join(broadcast(queries), col("__cl") === col("label"))
      .withColumn("sim", graft.functions.cosine_sim(col("embedding"), col("qvec")))
      .filter(col("sim") > 0.0)
      .select(col("query_id"), col("vec_id"), col("sim"))
      .groupBy("query_id")
      .agg(graft.functions.topk_by(col("vec_id"), col("sim"), lit(5)).as("t"))
      .select(col("query_id"), posexplode(col("t")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rn"))
    assert(topkSet(got) ==
      exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // every returned row is a label-mate
    val bad = got.join(e.select(col("vec_id"), col("label").as("__cl")), "vec_id")
      .join(queries.select(col("query_id"), col("label")), "query_id")
      .filter(col("__cl") =!= col("label"))
    assert(bad.isEmpty, "a non-label-mate leaked into filtered results")
  }

  test("label-aligned clusters: a query probes only cells holding its label") {
    import spark.implicits._
    // labels coincide with spatial clusters, so each label lives in
    // exactly one cell: the per-(cell, label) bound must keep every
    // probe inside that one cell — which the RESULT shows: rank-1 of a
    // member query is itself, and all hits share its cluster
    val rnd = new scala.util.Random(31)
    val e = (0L until 200L).map { i =>
      val cluster = (i % 4).toInt
      val base = Array.fill(8)(0.0f)
      base(cluster * 2) = 1.0f
      (i, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f), cluster)
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-filt-clu").toString
    IvfIndex.build(e.select("vec_id", "embedding"), "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 4))
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label"))
    val got = IvfIndex.queryTopKFiltered(spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", e.select("vec_id", "label"), "label",
      k = 3, threshold = 0.0)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // self is rank 1 (sim 1.0 with ascending-id tie-break on itself)
    val rank1 = rows.filter(_.getAs[Long]("rn") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    (0L until 8L).foreach(q => assert(rank1(q) == q, s"rank-1 of $q is not itself"))
    // all hits are label-mates == cluster-mates
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_id") % 4 == r.getAs[Long]("query_id") % 4,
        s"hit from a foreign cluster: $r")
    }
  }

  test("persisted label metadata serves the filtered path; staleness is detected") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def rows(from: Long, until: Long) = (from until until).map { i =>
      val base = Array.fill(8)(0.0f)
      base((i % 4).toInt * 2) = 1.0f
      (i, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f), (i % 3).toInt)
    }
    val e = rows(0L, 160L).toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-filt-meta").toString
    IvfIndex.build(e.select("vec_id", "embedding"), "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 4))

    // no artifact yet: nothing cached
    assert(IvfIndex.cachedLabelRadii(spark, dir, "label").isEmpty)
    IvfIndex.buildLabelMeta(spark, dir, "vec_id", "embedding",
      e.select("vec_id", "label"), "label")
    assert(IvfIndex.cachedLabelRadii(spark, dir, "label").isDefined)

    def query(corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
      val queries = corpus.filter(col("vec_id") < 6)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
          col("label"))
      topkSet(IvfIndex.queryTopKFiltered(spark, dir, "vec_id", "embedding",
        queries, "query_id", "qvec", corpus.select("vec_id", "label"), "label",
        k = 4, threshold = 0.0))
    }
    def exact(corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
      val queries = corpus.filter(col("vec_id") < 6)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
          col("label"))
      topkSet(corpus
        .select(col("vec_id"), col("embedding"), col("label").as("__cl"))
        .join(broadcast(queries), col("__cl") === col("label"))
        .withColumn("sim", graft.functions.cosine_sim(col("embedding"), col("qvec")))
        .filter(col("sim") > 0.0)
        .select(col("query_id"), col("vec_id"), col("sim"))
        .groupBy("query_id")
        .agg(graft.functions.topk_by(col("vec_id"), col("sim"), lit(4)).as("t"))
        .select(col("query_id"), posexplode(col("t")))
        .select(col("query_id"), col("col.id").as("vec_id"),
          (col("pos") + 1).cast("long").as("rn")))
    }
    // fresh cache: served and exact
    assert(query(e) == exact(e))

    // a LABEL-CARRYING append folds into the artifact (the upsertCells
    // batch-sized max-merge): post-append the cache must read as FRESH
    // and the query must stay exact over the grown corpus — the
    // appended rows can only need LARGER label radii, which is exactly
    // what the fold grows
    val extra = rows(160L, 200L).toDF("vec_id", "embedding", "label")
    IvfIndex.upsert(spark, dir, "vec_id", "embedding", extra)
    val grown = e.unionByName(extra)
    assert(IvfIndex.cachedLabelRadii(spark, dir, "label").isDefined,
      "a label-carrying append did not keep the artifact fresh")
    assert(query(grown) == exact(grown))

    // a LABEL-LESS append cannot be folded (the batch's labels are
    // unknown): the cache must read as stale and the query must fall
    // back — and STAY exact over the grown corpus
    val extra2 = rows(200L, 240L).toDF("vec_id", "embedding", "label")
    IvfIndex.upsert(spark, dir, "vec_id", "embedding",
      extra2.select("vec_id", "embedding"))
    val grown2 = grown.unionByName(extra2)
    assert(IvfIndex.cachedLabelRadii(spark, dir, "label").isEmpty,
      "a post-label-less-append cache read as fresh")
    assert(query(grown2) == exact(grown2))

    // rebuilt metadata is fresh again and still exact
    IvfIndex.buildLabelMeta(spark, dir, "vec_id", "embedding",
      grown2.select("vec_id", "label"), "label")
    assert(IvfIndex.cachedLabelRadii(spark, dir, "label").isDefined)
    assert(query(grown2) == exact(grown2))
    // ... and a fold on TOP of a rebuilt artifact still works (the
    // snapshot round-trips through the fold's arithmetic derivation)
    val extra3 = rows(240L, 260L).toDF("vec_id", "embedding", "label")
    IvfIndex.upsert(spark, dir, "vec_id", "embedding", extra3)
    val grown3 = grown2.unionByName(extra3)
    assert(IvfIndex.cachedLabelRadii(spark, dir, "label").isDefined,
      "a fold after rebuild did not keep the artifact fresh")
    assert(query(grown3) == exact(grown3))
  }

  test("near-unique labels branch to the overfetch fallback and stay exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    // label = vec_id / 2 → every label has exactly 2 members: with
    // k = 3 > group size, every query exercises the refill loop's
    // untruncated/exhausted finish rule, never the ≥ k rule
    val e = (0L until 120L).map { i =>
      val base = Array.fill(8)(0.0f)
      base((i % 4).toInt * 2) = 1.0f
      (i, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f), i / 2)
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-filt-hicard").toString
    IvfIndex.build(e.select("vec_id", "embedding"), "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 4))
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label"))
    // 60 distinct labels > maxLabelFanout = 16 → the fallback branch
    val (got, usedFallback) = IvfIndex.queryTopKFilteredWithPath(
      spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", e.select("vec_id", "label"), "label",
      k = 3, threshold = 0.0, probeWidth = 1, maxLabelFanout = 16L)
    assert(usedFallback, "high-cardinality labels did not take the fallback")
    val exact = e.select(col("vec_id"), col("embedding"), col("label").as("__cl"))
      .join(broadcast(queries), col("__cl") === col("label"))
      .withColumn("sim", graft.functions.cosine_sim(col("embedding"), col("qvec")))
      .filter(col("sim") > 0.0)
      .select(col("query_id"), col("vec_id"), col("sim"))
      .groupBy("query_id")
      .agg(graft.functions.topk_by(col("vec_id"), col("sim"), lit(3)).as("t"))
      .select(col("query_id"), posexplode(col("t")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rn"))
    assert(topkSet(got) ==
      exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // the branch decision, both ways: a roomy fanout cap keeps the
    // label-radius path (same fixture, same exact answers)
    val (got2, usedFallback2) = IvfIndex.queryTopKFilteredWithPath(
      spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", e.select("vec_id", "label"), "label",
      k = 3, threshold = 0.0, probeWidth = 1, maxLabelFanout = 1000000L)
    assert(!usedFallback2, "a roomy fanout cap still took the fallback")
    assert(topkSet(got2) == topkSet(got))
  }

  test("refill-cap escalation: stubborn queries take the direct equijoin and stay exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    // a SPARSE-but-scattered label: ids i % 15 == 0 share label 999 (8
    // mates spread across clusters), everyone else is unique — so a
    // 999-query's top-8 global hits are its own cluster's non-mates
    // (__m = 2 < k with a truncated list) and the tiny refill cap
    // forces the escalation branch on round 1
    val e = (0L until 120L).map { i =>
      val base = Array.fill(8)(0.0f)
      base((i % 4).toInt * 2) = 1.0f
      (i, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f),
        if (i % 15 == 0) 999L else i)
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-filt-esc").toString
    IvfIndex.build(e.select("vec_id", "embedding"), "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 4))
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label"))
    val (got, usedFallback) = IvfIndex.queryTopKFilteredWithPath(
      spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", e.select("vec_id", "label"), "label",
      k = 5, threshold = 0.0, probeWidth = 1, maxLabelFanout = 16L,
      refillCap = 8L)
    assert(usedFallback)
    val exact = e.select(col("vec_id"), col("embedding"), col("label").as("__cl"))
      .join(broadcast(queries), col("__cl") === col("label"))
      .withColumn("sim", graft.functions.cosine_sim(col("embedding"), col("qvec")))
      .filter(col("sim") > 0.0)
      .select(col("query_id"), col("vec_id"), col("sim"))
      .groupBy("query_id")
      .agg(graft.functions.topk_by(col("vec_id"), col("sim"), lit(5)).as("t"))
      .select(col("query_id"), posexplode(col("t")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rn"))
    assert(topkSet(got) ==
      exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // the escalated query really did need more than the cap could see:
    // every hit is a 999-mate, and mates OUTSIDE the top-8-visible own
    // cluster (which held only ids 0 and 60) surfaced too
    val q0 = got.filter(col("query_id") === 0).collect()
      .map(_.getAs[Long]("vec_id"))
    assert(q0.nonEmpty && q0.forall(_ % 15 == 0))
    assert(q0.exists(id => id != 0L && id != 60L),
      s"escalation surfaced no foreign-cluster mate: ${q0.toSeq}")
  }

  test("multi-label (IN-set) filtered top-k equals the set-restricted brute force") {
    val e = Tables(spark, Sf0001, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-filt-any").toString
    IvfIndex.build(e.select("vec_id", "embedding"), "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 8))
    // 2-label sets, with one query carrying a DUPLICATED label (the
    // reduction must not double its unit) and one an absent label
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        when(col("vec_id") === 0,
            array(col("label"), col("label")))       // duplicate
          .when(col("vec_id") === 1,
            array(col("label"), lit(999999)))        // half-absent
          .otherwise(array(col("label"), col("label") + lit(1)))
          .as("lbls"))
    val got = IvfIndex.queryTopKFilteredAny(spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", "lbls", e.select("vec_id", "label"), "label",
      k = 5, threshold = 0.0)
    val exact = e.select(col("vec_id"), col("embedding"), col("label").as("__cl"))
      .join(broadcast(queries), expr("array_contains(lbls, __cl)"))
      .withColumn("sim", graft.functions.cosine_sim(col("embedding"), col("qvec")))
      .filter(col("sim") > 0.0)
      .select(col("query_id"), col("vec_id"), col("sim"))
      .groupBy("query_id")
      .agg(graft.functions.topk_by(col("vec_id"), col("sim"), lit(5)).as("t"))
      .select(col("query_id"), posexplode(col("t")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rn"))
    assert(topkSet(got) ==
      exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    // no hit outside the query's set
    val bad = got.join(e.select(col("vec_id"), col("label").as("__cl")), "vec_id")
      .join(queries.select(col("query_id"), col("lbls")), "query_id")
      .filter(!expr("array_contains(lbls, __cl)"))
    assert(bad.isEmpty, "a row outside the label set leaked into multi-label results")
    // an all-absent set yields nothing
    val none = IvfIndex.queryTopKFilteredAny(spark, dir, "vec_id", "embedding",
      queries.limit(1).select(col("query_id"), col("qvec"),
        array(lit(888888), lit(999999)).as("lbls")),
      "query_id", "qvec", "lbls", e.select("vec_id", "label"), "label",
      k = 5, threshold = 0.0)
    assert(none.isEmpty, "an all-absent label set produced hits")
  }

  test("multi-label sets ride the high-cardinality fallback per unit and stay exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    // near-unique labels (pairs), 60 distinct > maxLabelFanout = 16:
    // every per-(query, label) unit reroutes to the overfetch fallback
    // — the composite struct ids must survive that machinery's
    // checkpoints, broadcasts, groupBys and the escalation equijoin
    val e = (0L until 120L).map { i =>
      val base = Array.fill(8)(0.0f)
      base((i % 4).toInt * 2) = 1.0f
      (i, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.08f), i / 2)
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-filt-anyfall").toString
    IvfIndex.build(e.select("vec_id", "embedding"), "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 4))
    val queries = e.filter(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        array(col("label"), col("label") + lit(7)).as("lbls"))
    val got = IvfIndex.queryTopKFilteredAny(spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", "lbls", e.select("vec_id", "label"), "label",
      k = 3, threshold = 0.0, probeWidth = 1, maxLabelFanout = 16L,
      refillCap = 8L)
    val exact = e.select(col("vec_id"), col("embedding"), col("label").as("__cl"))
      .join(broadcast(queries), expr("array_contains(lbls, __cl)"))
      .withColumn("sim", graft.functions.cosine_sim(col("embedding"), col("qvec")))
      .filter(col("sim") > 0.0)
      .select(col("query_id"), col("vec_id"), col("sim"))
      .groupBy("query_id")
      .agg(graft.functions.topk_by(col("vec_id"), col("sim"), lit(3)).as("t"))
      .select(col("query_id"), posexplode(col("t")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rn"))
    assert(topkSet(got) ==
      exact.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("a query whose label is absent from the corpus returns nothing") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    val e = (0L until 60L).map { i =>
      val base = Array.fill(8)(0.0f)
      base((i % 2).toInt * 4) = 1.0f
      (i, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f), (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-filt-absent").toString
    IvfIndex.build(e.select("vec_id", "embedding"), "vec_id", "embedding", dir,
      IvfIndex.Params(nCentroids = 2))
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        // queries 0/1 keep real labels; 2/3 ask for a label nobody has
        when(col("vec_id") < 2, col("label")).otherwise(lit(99)).as("label"))
    val got = IvfIndex.queryTopKFiltered(spark, dir, "vec_id", "embedding",
      queries, "query_id", "qvec", e.select("vec_id", "label"), "label",
      k = 3, threshold = 0.0)
    val byQuery = got.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.contains(0L) && byQuery.contains(1L))
    assert(!byQuery.contains(2L) && !byQuery.contains(3L),
      "an absent label produced hits")
  }
}
