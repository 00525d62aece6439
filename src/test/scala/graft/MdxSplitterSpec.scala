package graft

import graft.ingest.MdxSplitter
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Header-split semantics (A-2..A-6) on crafted MDX. */
class MdxSplitterSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def splitOne(mdx: String): Seq[Row] =
    MdxSplitter.split(Seq((1L, mdx)).toDF("doc_id", "mdx"), "doc_id", "mdx")
      .orderBy("chunk_id").collect().toSeq

  test("basic two-section document") {
    val rows = splitOne("## Context\nalpha beta\n## Summary\ngamma")
    assert(rows.map(r => (r.getInt(1), r.getString(2), r.getString(3))) == Seq(
      (1, "## Context", "alpha beta"),
      (2, "## Summary", "gamma")))
    // neighbor headers: '' at the edges
    assert(rows.map(r => (r.getString(4), r.getString(5))) == Seq(
      ("", "## Summary"), ("## Context", "")))
  }

  test("all six ATX heading levels split") {
    val mdx = (1 to 6).map(i => s"${"#" * i} H$i\nbody$i").mkString("\n")
    val rows = splitOne(mdx)
    assert(rows.map(_.getString(2)) == (1 to 6).map(i => s"${"#" * i} H$i"))
    assert(rows.map(_.getString(3)) == (1 to 6).map(i => s"body$i"))
  }

  test("seven hashes is not a heading") {
    val rows = splitOne("## Context\na\n####### NotAHeading\nb")
    assert(rows.size == 1)
    assert(rows.head.getString(3) == "a\n####### NotAHeading\nb")
  }

  test("content before the first heading keeps header=''") {
    val rows = splitOne("preamble text\n## Context\nbody")
    assert(rows.map(r => (r.getString(2), r.getString(3))) == Seq(
      ("", "preamble text"), ("## Context", "body")))
  }

  test("empty sections are dropped; missing trailing newline is fine") {
    val rows = splitOne("## A\n\n\n## B\nlast line")
    assert(rows.map(r => (r.getString(2), r.getString(3))) == Seq(
      ("## A", ""), ("## B", "last line")))
  }

  test("heading without a space is not a heading") {
    val rows = splitOne("##NoSpace\n## Real\nx")
    assert(rows.map(_.getString(2)) == Seq("", "## Real"))
  }

  test("A-6 validation flags documents whose first chunk is not ## Context") {
    val docs = Seq(
      (1L, "## Context\ngood"),
      (2L, "## Wrong\nbad"),
      (3L, "## Context extra words\nalso fine")).toDF("doc_id", "mdx")
    val bad = MdxSplitter.invalidDocs(
      MdxSplitter.split(docs, "doc_id", "mdx"), "doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(bad == Seq(2L))
  }
}
