package graft

import graft.functions.MinHashKernel
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class MinHashSpec extends AnyFunSuite {

  private def arr(items: Seq[String]) =
    new GenericArrayData(items.map(UTF8String.fromString).toArray[Any])

  private def sig(items: Seq[String], n: Int = 128): Seq[Long] = {
    val a = MinHashKernel.signature(arr(items), n)
    (0 until a.numElements()).map(a.getLong)
  }

  test("signature is deterministic and order/duplication-invariant") {
    val s = Seq("abc", "def", "ghi")
    assert(sig(s) == sig(s))
    assert(sig(s) == sig(s.reverse))
    assert(sig(s) == sig(s ++ s)) // min over a set ignores duplicates
  }

  test("empty input yields the all-Prime sentinel") {
    assert(sig(Seq.empty).forall(_ == MinHashKernel.Prime))
  }

  test("estJaccard: identical=1, disjoint~0, empty=0") {
    val a = sig(Seq("x", "y", "z"))
    assert(MinHashKernel.estJaccard(
      new GenericArrayData(a.toArray), new GenericArrayData(a.toArray)) == 1.0)
    val b = sig(Seq("p", "q", "r"))
    assert(MinHashKernel.estJaccard(
      new GenericArrayData(a.toArray), new GenericArrayData(b.toArray)) < 0.15)
    assert(MinHashKernel.estJaccard(
      new GenericArrayData(Array.empty[Any]),
      new GenericArrayData(Array.empty[Any])) == 0.0)
  }

  test("simhash banding is complete for Hamming distance <= maxHamming (property)") {
    // q16's candidate generation joins on the disjoint bands declared in
    // Dedup; by pigeonhole any pair within Hamming distance < bands must
    // agree on >= 1 band, so banding + exact verify equals the
    // brute-force pair set (what lets the golden oracle brute-force it).
    // Derived from the production constants so a layout change re-checks
    // the precondition here.
    import graft.pipeline.Dedup.{SimHashBands, SimHashBandBits, SimHashMaxHamming}
    assert(SimHashMaxHamming < SimHashBands, "pigeonhole precondition broken")
    assert(SimHashBands * SimHashBandBits == 64, "bands must tile the fingerprint")
    val mask = (1L << SimHashBandBits) - 1
    val fpGen = Gen.long
    val flipsGen = Gen.choose(0, SimHashMaxHamming).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 63)).map(_.distinct))
    val p = Prop.forAll(fpGen, flipsGen) { (fp, flips) =>
      val other = flips.foldLeft(fp)((v, b) => v ^ (1L << b))
      (0 until SimHashBands).exists(b =>
        ((fp >>> (b * SimHashBandBits)) & mask) ==
          ((other >>> (b * SimHashBandBits)) & mask))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("estJaccard tracks true Jaccard within estimator error (property)") {
    val gramGen = Gen.choose(0, 400).map(i => s"gram$i")
    val setGen = Gen.choose(10, 120).flatMap(n => Gen.listOfN(n, gramGen).map(_.distinct))
    val p = Prop.forAll(setGen, setGen) { (xs, ys) =>
      val inter = xs.toSet.intersect(ys.toSet).size
      val union = xs.toSet.union(ys.toSet).size
      val trueJac = if (union == 0) 0.0 else inter.toDouble / union
      val est = MinHashKernel.estJaccard(
        new GenericArrayData(sig(xs).toArray),
        new GenericArrayData(sig(ys).toArray))
      // Binomial(128, j): 5 sigma ≈ 5*sqrt(j(1-j)/128) <= 0.23
      math.abs(est - trueJac) < 0.23
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, s"scalacheck: ${res.status}")
  }
}
