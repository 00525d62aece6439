package graft

import graft.functions.{VectorOps, rp_project, cosine_sim}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ±1 random-projection kernel: deterministic (matrix regenerated
  * from indices alone), linear, and JL-distortion-bounded IN
  * EXPECTATION on similarity-structured vectors. Note the negative
  * result recorded in SURVEY §5.3: on the near-isotropic embedding
  * FIXTURES a projected shortlist cannot hold exact top-k recall at
  * useful overfetch (measured: worst true-top5 projected rank ≈ 340/1000
  * even at m=48), so no q-entry ships on top of this kernel — the IVF
  * triangle-bound path (q39/q77) is the exact-at-scale retrieval story.
  */
class RpProjectSpec extends AnyFunSuite with SharedSpark {

  private val rnd = new scala.util.Random(7)
  private def vec(d: Int): Array[Float] = Array.fill(d)(rnd.nextFloat() * 2 - 1)

  test("deterministic and linear") {
    val v = vec(64)
    val a = VectorOps.rpProject(v, 32)
    val b = VectorOps.rpProject(v, 32)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 32)
    // linearity: P(2v) == 2 P(v) exactly (same sign walk, float doubling)
    val twice = VectorOps.rpProject(v.map(_ * 2), 32)
    twice.zip(a).foreach { case (t, x) => assert(math.abs(t - 2 * x) < 1e-4) }
  }

  test("projected cosine tracks true cosine on structured vectors") {
    // clustered data (the case projections are FOR): base vectors plus
    // small noise — same-cluster pairs must stay far more similar than
    // cross-cluster pairs after projection
    val bases = Array.fill(4)(vec(64))
    def member(c: Int) = bases(c).zip(vec(64)).map { case (b, n) => b + 0.1f * n }
    val sameProj = (0 until 20).map { _ =>
      val c = rnd.nextInt(4)
      val (x, y) = (member(c), member(c))
      VectorOps.cosine(VectorOps.rpProject(x, 32), VectorOps.rpProject(y, 32))
    }
    val crossProj = (0 until 20).map { _ =>
      val c = rnd.nextInt(4)
      val (x, y) = (member(c), member((c + 1) % 4))
      VectorOps.cosine(VectorOps.rpProject(x, 32), VectorOps.rpProject(y, 32))
    }
    assert(sameProj.min > crossProj.max,
      s"projection destroyed cluster structure: same=${sameProj.min} cross=${crossProj.max}")
  }

  test("column API and SQL registration agree with the kernel") {
    import spark.implicits._
    graft.functions.registerAll(spark)
    val v = vec(16)
    val fromCol = Seq(v).toDF("v")
      .select(rp_project(col("v"), lit(8)).as("p"))
      .head.getSeq[Float](0)
    assert(fromCol == VectorOps.rpProject(v, 8).toSeq)
    val fromSql = spark.sql(
      s"SELECT rp_project(array(${v.map(x => s"${x}F").mkString(",")}), 8) AS p")
      .head.getSeq[Float](0)
    assert(fromSql == VectorOps.rpProject(v, 8).toSeq)
  }
}
