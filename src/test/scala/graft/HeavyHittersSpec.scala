package graft

import graft.pipeline.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SharedSpark {

  test("mgSummary: deficit bound and guaranteed retention") {
    val rnd = new scala.util.Random(3)
    // skewed stream: item i appears ~ 1000 / (i+1) times, shuffled
    val stream = rnd.shuffle(
      (0 until 200).flatMap(i => Seq.fill(1000 / (i + 1))(s"w$i")).toVector)
    val n = stream.size
    val k = 20
    val sum = HeavyHitters.mgSummary(stream.iterator, k)
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

    assert(sum.size <= k)
    // counters never overcount, and undercount by at most n/(k+1)
    sum.foreach { case (t, c) =>
      assert(c <= exact(t))
      assert(exact(t) - c <= n / (k + 1))
    }
    // every item above the deficit bound is retained
    exact.filter(_._2 > n / (k + 1)).keys.foreach(t => assert(sum.contains(t)))
  }

  test("mgMerge: stays under k counters, keeps the combined guarantee") {
    val rnd = new scala.util.Random(7)
    val a = rnd.shuffle((0 until 100).flatMap(i => Seq.fill(500 / (i + 1))(s"w$i")).toVector)
    val b = rnd.shuffle((50 until 150).flatMap(i => Seq.fill(500 / (i - 49))(s"w$i")).toVector)
    val k = 15
    val merged = HeavyHitters.mgMerge(
      HeavyHitters.mgSummary(a.iterator, k),
      HeavyHitters.mgSummary(b.iterator, k), k)
    val all = a ++ b
    val exact = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

    assert(merged.size <= k)
    merged.foreach { case (t, c) =>
      assert(c <= exact(t))
      assert(exact(t) - c <= all.size / (k + 1))
    }
    exact.filter(_._2 > all.size / (k + 1)).keys
      .foreach(t => assert(merged.contains(t)))
  }

  test("frequentItems EQUALS the exact threshold answer on a skewed frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // long tail of near-unique values + a handful of dominating ones,
    // shuffled across partitions so per-partition sketches disagree
    val rows = rnd.shuffle(
      ((0 until 5000).map(i => s"tail_$i") ++
        (0 until 5).flatMap(i => Seq.fill(800 * (i + 1))(s"hot_$i"))).toVector)
    val df = rows.toDF("item").repartition(8)
    val k = 40

    val got = HeavyHitters.frequentItems(df, "item", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val n = rows.size.toLong
    val expect = rows.groupBy(identity)
      .map { case (t, xs) => (t, xs.size.toLong) }
      .filter { case (_, c) => c * k > n }.toSet
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("partial-summary merge runs on executors (multi-stage tree), not a driver collect") {
    import spark.implicits._
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    // 64 map partitions force many partials; treeAggregate(depth=3)
    // must merge them through shuffle levels, so the (single) merge
    // job has >= 2 stages. The old collect()-then-reduce shape is a
    // one-stage job with 64 result tasks landing on the driver.
    val df = (0 until 20000).map(i => s"v_${i % 37}").toDF("item").repartition(64)
    val stageCounts = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        stageCounts.add(js.stageInfos.size)
    }
    spark.sparkContext.addSparkListener(listener)
    val out =
      try {
        // frequentItems runs the sketch-merge action eagerly; the
        // returned frame is lazy, so the only job(s) seen here are the
        // merge's
        val res = HeavyHitters.frequentItems(df, "item", 16)
        val deadline = System.currentTimeMillis + 10000
        while (stageCounts.isEmpty && System.currentTimeMillis < deadline)
          Thread.sleep(50)
        res
      } finally spark.sparkContext.removeSparkListener(listener)
    val counts = scala.jdk.CollectionConverters.CollectionHasAsScala(stageCounts).asScala.toVector
    assert(counts.nonEmpty, "merge job never surfaced on the listener bus")
    assert(counts.max >= 2,
      s"sketch merge ran as single-stage jobs ($counts) — driver-side merge shape")
    // and the result is still the exact threshold answer
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expect = (0 until 20000).map(i => s"v_${i % 37}")
      .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
      .filter { case (_, c) => c * 16 > 20000 }.toSet
    assert(got == expect)
  }

  test("empty input yields an empty result, not an exception") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("item")
    val out = HeavyHitters.frequentItems(empty, "item", 10)
    assert(out.isEmpty)
    assert(out.columns.toSeq == Seq("item", "cnt"))
  }

  test("q86 shape on the fixture: exact counts, threshold respected") {
    val out = HeavyHitters.q86FrequentGrams(spark, Sf0001)
    // at sf0.001 n/4000 < 1, so EVERY gram qualifies — the degenerate
    // small-corpus case must still return the exact per-gram counts
    val total = out.agg(sum("cnt")).head.getLong(0)
    val grams = Tables(spark, Sf0001, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
    // token count - 2*(docs with >= 3 tokens) == trigram instances
    assert(out.filter(col("cnt") < 1).isEmpty)
    assert(total > 0 && total <= grams.count())
  }
}
