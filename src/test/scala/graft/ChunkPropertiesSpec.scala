package graft

import graft.functions.TextChunker
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck invariants for the chunker (SURVEY §5.2 item 2), driven
  * directly (no scalatest-plus bridge in the offline dependency set).
  */
class ChunkPropertiesSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
    val res = SCTest.check(params, p)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  private val wordGen = Gen.choose(1, 12).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaNumChar))
  private val textGen = for {
    n <- Gen.choose(0, 80)
    words <- Gen.listOfN(n, wordGen)
    seps <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", " ", "\n", "\n\n"))
  } yield words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString

  private val cfgGen = for {
    size <- Gen.choose(5, 120)
    overlap <- Gen.choose(0, 4).map(f => size * f / 5)
  } yield (size, overlap)

  test("every chunk fits the budget and is trimmed and non-empty") {
    checkProp(Prop.forAll(textGen, cfgGen) { case (text, (size, overlap)) =>
      val chunks = TextChunker.split(text, size, overlap)
      chunks.forall(c => c.length <= size && c.nonEmpty && c == c.trim)
    })
  }

  test("every non-whitespace character of the input is covered") {
    checkProp(Prop.forAll(textGen, cfgGen) { case (text, (size, overlap)) =>
      val joined = TextChunker.split(text, size, overlap).mkString(" ")
      // multiset of non-ws chars in output >= in input (overlap duplicates)
      val inCounts = text.filterNot(_.isWhitespace)
        .groupBy(identity).view.mapValues(_.length)
      val outCounts = joined.filterNot(_.isWhitespace)
        .groupBy(identity).view.mapValues(_.length).toMap
      inCounts.forall { case (ch, n) => outCounts.getOrElse(ch, 0) >= n }
    })
  }

  test("chunking is deterministic") {
    checkProp(Prop.forAll(textGen, cfgGen) { case (text, (size, overlap)) =>
      TextChunker.split(text, size, overlap) ==
        TextChunker.split(text, size, overlap)
    })
  }

  test("blank-only inputs yield no chunks") {
    checkProp(Prop.forAll(Gen.listOf(Gen.oneOf(" ", "\n")).map(_.mkString), cfgGen) {
      case (ws, (size, overlap)) =>
        TextChunker.split(ws, size, overlap).isEmpty
    })
  }
}
