package graft

import graft.query.QuantizedSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizedSearchSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def randVec(rnd: scala.util.Random, dim: Int): Array[Float] = {
    val v = Array.fill(dim)((rnd.nextGaussian()).toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  test("codes stay within [-127, 127] and zero vectors quantize to zeros") {
    val rnd = new scala.util.Random(7)
    val df = ((0 until 50).map(i => (i.toLong, randVec(rnd, 16)))
      :+ (99L, Array.fill(16)(0.0f))).toDF("id", "v")
    val codes = df.select(QuantizedSearch.quantize(col("v")).as("q"))
      .select(explode(col("q"))).as[Long].collect()
    assert(codes.forall(c => c >= -127 && c <= 127))
    val zeroRow = df.filter(col("id") === 99L)
      .select(QuantizedSearch.quantize(col("v")).as("q"))
      .select(array_max(col("q")), array_min(col("q"))).head
    assert(zeroRow.getLong(0) == 0L && zeroRow.getLong(1) == 0L)
  }

  test("quantized cosine tracks float cosine within the int8 error bound") {
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 60).map(i => (i.toLong, randVec(rnd, 64)))
    val df = vecs.toDF("id", "v")
    val q = df.select(col("id"), QuantizedSearch.quantize(col("v")).as("q"),
      col("v"))
    val pairs = q.as("a").crossJoin(q.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(
        QuantizedSearch.quantizedCosine(
          QuantizedSearch.intDot(col("a.q"), col("b.q")),
          QuantizedSearch.intDot(col("a.q"), col("a.q")),
          QuantizedSearch.intDot(col("b.q"), col("b.q"))).as("qsim"),
        aggregate(zip_with(col("a.v"), col("b.v"),
            (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x).as("fdot"),
        sqrt(aggregate(transform(col("a.v"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("na"),
        sqrt(aggregate(transform(col("b.v"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("nb"))
      .select(col("qsim"), (col("fdot") / (col("na") * col("nb"))).as("fsim"))
      .as[(Double, Double)].collect()
    val maxErr = pairs.map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr < 0.03, s"max |qsim - fsim| = $maxErr")
  }

  test("topKBatch returns k ranked rows per query with rank 1 = self") {
    val rnd = new scala.util.Random(13)
    val df = (0 until 40).map(i => (i.toLong, randVec(rnd, 32))).toDF("id", "v")
    val queries = df.filter(col("id") < 3)
      .select(col("id").as("qid"), col("v").as("qv"))
    val out = QuantizedSearch.topKBatch(df, "id", "v", queries, "qid", "qv", k = 4)
      .orderBy("qid", "rn")
      .select("qid", "id", "rn").as[(Long, Long, Long)].collect()
    assert(out.length == 12)
    // self-similarity is exactly 1 under symmetric quantization -> rank 1
    assert(out.filter(_._3 == 1L).forall(r => r._1 == r._2))
  }
}
