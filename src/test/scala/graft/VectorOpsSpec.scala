package graft

import graft.functions.VectorOps
import org.scalatest.funsuite.AnyFunSuite

class VectorOpsSpec extends AnyFunSuite {

  test("cosine: orthogonal, identical, opposite, zero") {
    assert(VectorOps.cosine(Array(1f, 0f), Array(0f, 1f)) == 0.0)
    assert(math.abs(VectorOps.cosine(Array(1f, 2f, 3f), Array(1f, 2f, 3f)) - 1.0) < 1e-12)
    assert(math.abs(VectorOps.cosine(Array(1f, 1f), Array(-1f, -1f)) + 1.0) < 1e-12)
    assert(VectorOps.cosine(Array(0f, 0f), Array(1f, 2f)) == 0.0)
  }

  test("cosine matches the naive double formula") {
    val x = Array(0.5f, -1.25f, 3f, 0.125f)
    val y = Array(2f, 0.75f, -0.5f, 1f)
    val dot = x.zip(y).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val expected = dot / (math.sqrt(x.map(v => v.toDouble * v).sum) *
      math.sqrt(y.map(v => v.toDouble * v).sum))
    assert(math.abs(VectorOps.cosine(x, y) - expected) < 1e-12)
  }

  test("l2 norm and squared distance") {
    assert(VectorOps.l2Norm(Array(3f, 4f)) == 5.0)
    assert(VectorOps.l2Sq(Array(1f, 2f), Array(4f, 6f)) == 25.0)
  }

  test("hashEmbed is deterministic, unit-norm, dimension-correct") {
    val a = VectorOps.hashEmbed("some text to embed", 64)
    val b = VectorOps.hashEmbed("some text to embed", 64)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    assert(math.abs(VectorOps.l2Norm(a) - 1.0) < 1e-6)
    // different text -> different vector
    val c = VectorOps.hashEmbed("different text", 64)
    assert(a.toSeq != c.toSeq)
    // degenerate inputs -> zero vector, no crash
    assert(VectorOps.hashEmbed("", 8).toSeq == Seq.fill(8)(0f))
    assert(VectorOps.hashEmbed(null, 8).toSeq == Seq.fill(8)(0f))
  }

  test("simhash64: deterministic, null-safe, near-dup property") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    assert(VectorOps.simhash64(base) == VectorOps.simhash64(base))
    assert(VectorOps.simhash64(null) == 0L)
    val near = base.replace("again and again", "again and againn")
    val far = "completely unrelated words about databases and query engines"
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(VectorOps.simhash64(base), VectorOps.simhash64(near)) <
      hamming(VectorOps.simhash64(base), VectorOps.simhash64(far)))
  }

  test("rollingHash known values") {
    assert(VectorOps.rollingHash("") == 0L)
    assert(VectorOps.rollingHash("a") == 'a'.toLong)
    assert(VectorOps.rollingHash("ab") == 'a'.toLong * 1000003L + 'b'.toLong)
  }
}
