package graft

import graft.functions.{topk_by, TopKHeap}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The topk_by typed aggregate must be row-for-row identical to the
  * row_number window it replaced in the batch-retrieval kernels — same
  * total order (score desc, id asc), same under-k behavior — while
  * being insensitive to partitioning (the map-side partial path).
  */
class TopKAggSpec extends AnyFunSuite with SharedSpark {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("g"), col("id"), col("s"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(topk_by(col("id"), col("s"), lit(k)).as("t"))
      .select(col("g"), posexplode(col("t")))
      .select(col("g"), col("col.id"), col("col.score"), (col("pos") + 1).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet

  test("agrees with the row_number window, ties and all, at any partitioning") {
    import spark.implicits._
    // deterministic pseudo-random data with engineered score ties
    val rows = (0L until 500L).map { i =>
      val g = i % 7
      val s = ((i * 2654435761L) % 97).toDouble / 10.0 // many exact ties
      (g, i, s)
    }
    for (parts <- Seq(1, 3, 13)) {
      val df = rows.toDF("g", "id", "s").repartition(parts)
      assert(aggTopK(df, 5) === windowTopK(df, 5), s"parts=$parts k=5")
      assert(aggTopK(df, 64) === windowTopK(df, 64), s"parts=$parts k=64")
    }
  }

  test("groups smaller than k return all their rows, ranked") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 20L, 0.1)).toDF("g", "id", "s")
    assert(aggTopK(df, 10) === Set(
      (1L, 11L, 0.9, 1L), (1L, 10L, 0.5, 2L), (2L, 20L, 0.1, 1L)))
  }

  test("exact ties rank by ascending id") {
    import spark.implicits._
    val df = Seq((1L, 30L, 1.0), (1L, 10L, 1.0), (1L, 20L, 1.0)).toDF("g", "id", "s")
    assert(aggTopK(df, 2) === Set((1L, 10L, 1.0, 1L), (1L, 20L, 1.0, 2L)))
  }

  test("callable from SQL after registration") {
    graft.functions.registerAll(spark)
    import spark.implicits._
    Seq((1L, 1L, 0.3), (1L, 2L, 0.7)).toDF("g", "id", "s")
      .createOrReplaceTempView("topk_sql_probe")
    val out = spark.sql(
      "SELECT g, topk_by(id, s, 1) AS t FROM topk_sql_probe GROUP BY g")
      .selectExpr("t[0].id AS id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("heap kernel: insertion order never changes the retained set") {
    val entries = (0L until 40L).map(i => (i, ((i * 31) % 11).toDouble))
    val expected = entries.sortBy { case (id, s) => (-s, id) }.take(7)
    for (seed <- 1 to 5) {
      val shuffled = new scala.util.Random(seed).shuffle(entries)
      val h = new TopKHeap(7)
      shuffled.foreach { case (id, s) =>
        h.insert(id, graft.functions.TopKByScore.toSortable(s))
      }
      val got = h.sorted.toSeq.map { case (id, bits) =>
        (id, graft.functions.TopKByScore.fromSortable(bits))
      }
      assert(got === expected, s"seed=$seed")
    }
  }

  test("NaN scores rank greatest (Spark's sort order), never corrupt the heap") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 1.0), (1L, 11L, Double.NaN), (1L, 12L, 2.0),
      (1L, 13L, Double.NegativeInfinity), (1L, 14L, Double.NaN))
      .toDF("g", "id", "s")
    val got = df.groupBy("g")
      .agg(topk_by(col("id"), col("s"), lit(3)).as("t"))
      .selectExpr("t[0].id", "t[1].id", "t[2].id").collect().head
    // NaN ties break by id asc, then the real scores descend
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((11L, 14L, 12L)))
  }

  test("property: heap equals sort-take for arbitrary entries and k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCase = for {
      n <- Gen.choose(0, 60)
      k <- Gen.choose(0, 12)
      // small score domain so exact ties are common; negatives and
      // zeros included (the -0.0 path is covered by canonicalization
      // at the aggregate layer, not the raw heap)
      entries <- Gen.listOfN(n,
        Gen.zip(Gen.choose(0L, 30L), Gen.choose(-5, 5).map(_.toDouble / 2)))
    } yield (entries, k)
    val prop = Prop.forAll(genCase) { case (entries, k) =>
      // ids deduped: the kernels always feed unique ids per group
      val uniq = entries.groupBy(_._1).map { case (id, vs) => (id, vs.head._2) }.toSeq
      val expected = uniq.sortBy { case (id, s) => (-s, id) }.take(k)
      val h = new TopKHeap(k)
      uniq.foreach { case (id, s) =>
        h.insert(id, graft.functions.TopKByScore.toSortable(s))
      }
      h.sorted.toSeq.map { case (id, bits) =>
        (id, graft.functions.TopKByScore.fromSortable(bits))
      } == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("null ids and scores are skipped, not ranked") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10L), Some(0.5)),
      (1L, None, Some(0.9)),
      (1L, Some(12L), None),
      (1L, Some(11L), Some(0.7))
    ).toDF("g", "id", "s")
    assert(aggTopK(df.select(col("g"), col("id"), col("s")), 10) === Set(
      (1L, 11L, 0.7, 1L), (1L, 10L, 0.5, 2L)))
  }

  test("long scores order exactly past 2^53") {
    import spark.implicits._
    // adjacent longs that collapse to the SAME double: double ranking
    // could return either; exact long ranking must pick the larger
    val big = (1L << 60)
    val df = Seq((1L, 10L, big + 1), (1L, 20L, big + 2), (1L, 30L, big))
      .toDF("g", "id", "s")
    val out = df.groupBy("g")
      .agg(topk_by(col("id"), col("s"), lit(2)).as("t"))
      .selectExpr("t[0].id", "t[0].score", "t[1].id")
      .collect().head
    assert(out.getLong(0) === 20L && out.getLong(1) === big + 2)
    assert(out.getLong(2) === 10L)
  }
}
