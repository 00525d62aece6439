package graft

import graft.functions.TextChunker
import org.scalatest.funsuite.AnyFunSuite

/** Chunker check against an EXTERNAL probe input (SURVEY §7.4 risk #1).
  *
  * The input below is the canonical adversarial probe text from the
  * published LangChain text-splitter test suite (the "weird text to
  * write" case, exercised by both the Python and JS suites against
  * `RecursiveCharacterTextSplitter(chunkSize=10, chunkOverlap=1)`) — an
  * input chosen by NEITHER of this repo's two implementations, covering
  * every tricky path at once: multi-newline separators, overlap
  * carry-over, an oversized word forced into character-level recursion,
  * and a trailing merge across a "\n\n" separator.
  *
  * Provenance honesty: this container has no network, so the EXPECTED
  * list is not a byte-copy of the upstream assertion; it is derived by
  * hand-executing the published current merge algorithm (the per-step
  * traces are inline below) and independently reproduced by the Python
  * twin (tools/make_golden.py). Older LangChain releases (pre
  * separator-inclusive length accounting) emit a different list for
  * this input — e.g. bare "weird" instead of the overlap-carried
  * "a weird" — which is exactly the divergence class this probe pins.
  */
class ChunkerExternalProbeSpec extends AnyFunSuite {

  private val probeText =
    "Hi.\n\nI'm Harrison.\n\nHow? Are? You?\nOkay then f f f f.\n" +
      "This is a weird text to write, but gotta test the splittingggg some how.\n\n\n" +
      "Bye!\n\n-H."

  test("external probe text: chunkSize=10 / chunkOverlap=1") {
    val out = TextChunker.split(probeText, 10, 1)
    assert(out == Seq(
      "Hi.",
      "I'm",
      "Harrison.",
      "How? Are?",
      "You?",
      "Okay then",
      "f f f f.",
      "This is a",
      // overlap carry: flushing "This is a" pops down to total<=1,
      // keeping "a" (len 1) -> next chunk starts with the overlap word
      "a weird",
      "text to",
      "write, but",
      "gotta test",
      "the",
      // "splittingggg" (12 chars) > chunkSize -> char-level recursion:
      // chars fill to 10 ("splittingg"), pop to the 1-char overlap 'g',
      // remaining 2 g's join it -> "ggg"
      "splittingg",
      "ggg",
      "some how.",
      // "\nBye!" (5) + sep(2) + "-H." (3) == 10 == chunkSize -> one
      // chunk, trimmed of the leading newline only
      "Bye!\n\n-H."))
  }

  test("probe pieces respect the size bound after trimming") {
    val out = TextChunker.split(probeText, 10, 1)
    assert(out.forall(_.length <= 10))
    assert(out.forall(_.nonEmpty))
  }
}
