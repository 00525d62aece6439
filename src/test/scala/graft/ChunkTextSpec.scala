package graft

import graft.functions.TextChunker
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the LangChain-semantics recursive character splitter
  * (SURVEY §7.4 risk #1). Expected values are hand-executed from the
  * published RecursiveCharacterTextSplitter algorithm (split on
  * ["\n\n","\n"," ",""] descending, greedy merge with separator-inclusive
  * length accounting, overlap carry, trim, drop empties).
  */
class ChunkTextSpec extends AnyFunSuite {

  test("empty and blank input") {
    assert(TextChunker.split("", 10, 2) == Seq.empty)
    assert(TextChunker.split(null, 10, 2) == Seq.empty)
    // whitespace-only: pieces trim to empty and are dropped
    assert(TextChunker.split("   ", 10, 2) == Seq.empty)
  }

  test("short input passes through untouched (single chunk, trimmed)") {
    assert(TextChunker.split("hello world", 100, 10) == Seq("hello world"))
    assert(TextChunker.split("  hello  ", 100, 10) == Seq("hello"))
  }

  test("word merge with single-char overlap carry") {
    // sep=" ": windows slide by one word under overlap budget 1
    assert(TextChunker.split("a b c d e", 3, 1) ==
      Seq("a b", "b c", "c d", "d e"))
  }

  test("separator length counts toward the chunk budget") {
    // "aaa bbb" = 7 chars <= 10 with the joining space counted;
    // adding "ccc" would need 11 > 10, so the window slides by one word
    assert(TextChunker.split("aaa bbb ccc ddd", 10, 3) ==
      Seq("aaa bbb", "bbb ccc", "ccc ddd"))
  }

  test("overlap-shrink loop subtracts the separator of the evicted head") {
    // The pre-fix accounting (content-only totals) emits the oversized
    // chunk "a b c d" here; LangChain semantics never exceed chunkSize.
    assert(TextChunker.split("a b c d e f", 5, 3) ==
      Seq("a b c", "b c d", "c d e", "d e f"))
  }

  test("paragraph separator is preferred and kept inside a merged chunk") {
    assert(TextChunker.split("para one here\n\nsecond para\n\nthird", 20, 5) ==
      Seq("para one here", "second para\n\nthird"))
  }

  test("oversized paragraph recurses into the next separator") {
    assert(TextChunker.split("aaaa bbbb\ncccc dddd eeee", 10, 2) ==
      Seq("aaaa bbbb", "cccc dddd", "eeee"))
  }

  test("no separators at all falls back to character split") {
    assert(TextChunker.split("abcdefghij", 4, 1) ==
      Seq("abcd", "defg", "ghij"))
  }

  test("consecutive separators produce no empty pieces") {
    assert(TextChunker.split("a  b", 10, 0) == Seq("a b"))
    assert(TextChunker.split("a\n\n\n\nb", 10, 0) == Seq("a\n\nb") ||
      TextChunker.split("a\n\n\n\nb", 10, 0) == Seq("a", "b"))
  }

  test("zero overlap never repeats content") {
    val chunks = TextChunker.split("one two three four five six", 9, 0)
    assert(chunks == Seq("one two", "three", "four five", "six"))
  }

  test("the declared fixture configuration: chunkSize=200 overlap=40") {
    // 60 8-char words joined by spaces: 60*8 + 59 = 539 chars
    val words = (0 until 60).map(i => f"word$i%04d")
    val text = words.mkString(" ")
    val chunks = TextChunker.split(text, 200, 40)
    assert(chunks.nonEmpty)
    assert(chunks.forall(_.length <= 200))
    // full coverage: every word appears in at least one chunk
    val joined = chunks.mkString(" ")
    assert(words.forall(joined.contains))
    // overlap: consecutive chunks share a suffix/prefix within the budget
    chunks.sliding(2).foreach {
      case Seq(a, b) =>
        val shared = a.split(" ").toSet.intersect(b.split(" ").toSet)
        assert(shared.map(_.length + 1).sum <= 40 + 1,
          s"overlap budget exceeded between '$a' and '$b'")
      case _ =>
    }
  }

  test("ingest defaults: chunkSize=80 overlap=16") {
    val text = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliett kilo lima mike november oscar papa quebec romeo sierra tango")
    val chunks = TextChunker.split(text, 80, 16)
    assert(chunks.forall(_.length <= 80))
    assert(chunks.mkString(" ").split(" ").toSet == text.split(" ").toSet)
  }
}
