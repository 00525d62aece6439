package graft

import graft.pipeline.{CurationStore, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationStoreSpec extends AnyFunSuite with SharedSpark {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("store-backed q97/q100 equal the recompute paths on the fixture") {
    val work = java.nio.file.Files.createTempDirectory("graft-curation").toString + "/store"
    CurationStore.build(spark, Sf0001, work)
    assert(rows(CurationStore.bestOfCluster(spark, work)) ==
      rows(Dedup.q100BestOfCluster(spark, Sf0001)))
    assert(rows(CurationStore.leakageSafeSplit(spark, work)) ==
      rows(Dedup.q97LeakageSafeSplit(spark, Sf0001)))
  }

  test("append folds a batch in: clusters equal the full recompute, scores follow the frozen model") {
    import spark.implicits._
    val all = Tables(spark, Sf0001, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val cutoff = all(all.length * 7 / 10)._1
    val base = java.nio.file.Files.createTempDirectory("graft-cur-base").toString
    all.filter(_._1 < cutoff).toSeq.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")

    val work = java.nio.file.Files.createTempDirectory("graft-cur-store").toString + "/store"
    CurationStore.build(spark, base, work)
    val batch = all.filter(_._1 >= cutoff).toSeq.toDF("doc_id", "text", "source")
    CurationStore.append(spark, batch, work)

    // cluster labels equal the full-corpus recompute: contracted-graph
    // merge + partition-pruned corpus probe lose nothing vs re-running
    // LSH + connected components over everything
    val got = spark.read.parquet(s"$work/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Dedup.connectedComponents(
        Dedup.verifiedNearDupPairs(spark, Sf0001, 0.5).select("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)

    // the split universe covers everything exactly once and stays
    // cluster-consistent after the merge
    val splitDf = CurationStore.leakageSafeSplit(spark, work)
    assert(splitDf.count() == all.length)
    assert(splitDf.groupBy("cluster_id").agg(count_distinct(col("split")).as("n"))
      .filter(col("n") > 1).isEmpty)

    // appended docs are scored under the FROZEN base model: recompute
    // the same left-join scoring directly from the stored model frames
    val uni = spark.read.parquet(s"$work/model/unigrams")
    val bi = spark.read.parquet(s"$work/model/bigrams")
    val vocab = spark.read.parquet(s"$work/model/vocab")
    val wantScores = batch
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(vocab)
      .withColumn("__ppm",
        expr("(coalesce(c12, 0) + 1) * 1000000 div (coalesce(c1, 0) + vsz)"))
      .groupBy("doc_id")
      .agg(sum(col("m") * col("__ppm")).cast("long").as("sum_prob_ppm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotScores = spark.read.parquet(s"$work/scores")
      .filter(col("doc_id") >= cutoff)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotScores == wantScores)

    // compaction after the append: fewer files, identical store reads
    val preClusters = got
    val preScores = spark.read.parquet(s"$work/scores")
      .collect().map(_.toSeq).toSet
    val reports = CurationStore.compactStore(spark, work)
    assert(reports.nonEmpty)
    assert(reports.map(_.filesAfter).sum < reports.map(_.filesBefore).sum,
      s"compaction did not shrink the store: $reports")
    assert(spark.read.parquet(s"$work/clusters")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == preClusters)
    assert(spark.read.parquet(s"$work/scores")
      .collect().map(_.toSeq).toSet == preScores)

    Dedup.unpersistSigs(spark, base)
  }

  test("warm reads never re-pay the corpus passes: plans touch only store files") {
    val work = java.nio.file.Files.createTempDirectory("graft-cur-warm").toString + "/store"
    CurationStore.build(spark, Sf0001, work)
    // the warm faces must read the persisted artifacts, not the corpus:
    // no documents.parquet scan anywhere in their plans
    for (df <- Seq(
        CurationStore.bestOfCluster(spark, work),
        CurationStore.leakageSafeSplit(spark, work))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("documents.parquet"),
        "warm read rescanned the corpus:\n" + plan.take(2000))
    }
  }
}
