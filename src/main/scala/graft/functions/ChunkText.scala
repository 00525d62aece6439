package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Recursive character text chunker with the exact semantics of the
  * splitter the reference configures (LangChain-JS
  * `RecursiveCharacterTextSplitter`, reference
  * src/clients/vector-client.ts:202-207, defaults chunkSize=1000 /
  * chunkOverlap=200 at :72-73): split on `["\n\n", "\n", " ", ""]`
  * descending, recurse into oversized splits, greedily merge adjacent
  * splits to ≤ chunkSize with ≤ chunkOverlap carried over, trim each
  * emitted chunk, drop empties. `keepSeparator=false` (the JS default the
  * reference never overrides).
  *
  * Pure deterministic Scala — golden-testable without Spark.
  */
object TextChunker {

  val DefaultSeparators: Seq[String] = Seq("\n\n", "\n", " ", "")

  def split(text: String, chunkSize: Int, chunkOverlap: Int): Seq[String] = {
    require(chunkOverlap < chunkSize, "chunkOverlap must be < chunkSize")
    if (text == null || text.isEmpty) Seq.empty
    else splitRec(text, DefaultSeparators.toList, chunkSize, chunkOverlap)
  }

  private def splitOnSeparator(text: String, sep: String): Seq[String] = {
    val pieces: Seq[String] =
      if (sep.nonEmpty)
        // JS String.split keeps trailing empties; they are filtered below
        text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
      else text.map(_.toString)
    pieces.filter(_.nonEmpty)
  }

  private def splitRec(
      text: String,
      separators: List[String],
      chunkSize: Int,
      chunkOverlap: Int): Seq[String] = {
    // pick the first separator that occurs in the text; "" always matches
    var separator = separators.last
    var newSeparators: List[String] = null
    var i = 0
    var found = false
    while (i < separators.length && !found) {
      val s = separators(i)
      if (s.isEmpty) { separator = s; found = true }
      else if (text.contains(s)) {
        separator = s; newSeparators = separators.drop(i + 1); found = true
      }
      i += 1
    }

    val splits = splitOnSeparator(text, separator)
    val out = new ArrayBuffer[String]
    val good = new ArrayBuffer[String]
    for (s <- splits) {
      if (s.length < chunkSize) good += s
      else {
        if (good.nonEmpty) {
          out ++= mergeSplits(good.toSeq, separator, chunkSize, chunkOverlap)
          good.clear()
        }
        if (newSeparators == null) out += s
        else out ++= splitRec(s, newSeparators, chunkSize, chunkOverlap)
      }
    }
    if (good.nonEmpty) out ++= mergeSplits(good.toSeq, separator, chunkSize, chunkOverlap)
    out.toSeq
  }

  private def joinDocs(docs: Seq[String], sep: String): Option[String] = {
    val t = docs.mkString(sep).trim
    if (t.isEmpty) None else Some(t)
  }

  /** Greedy merge with overlap carry-over — mirrors the LangChain-JS
    * `TextSplitter.mergeSplits` loop exactly: `total` includes one
    * separator per join (i.e. `sepLen` whenever the buffer already holds a
    * piece), the overflow check adds one separator when the buffer is
    * non-empty, and the overlap-shrink loop subtracts the separator that
    * linked the evicted head to its successor.
    */
  private def mergeSplits(
      splits: Seq[String],
      separator: String,
      chunkSize: Int,
      chunkOverlap: Int): Seq[String] = {
    val sepLen = separator.length
    val docs = new ArrayBuffer[String]
    val current = new ArrayBuffer[String]
    var total = 0
    for (d <- splits) {
      val len = d.length
      if (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize) {
        if (current.nonEmpty) {
          joinDocs(current.toSeq, separator).foreach(docs += _)
          // keep popping while over the overlap budget, or while adding
          // `d` would still overflow and the buffer is non-empty
          while (total > chunkOverlap ||
              (total + len + (if (current.nonEmpty) sepLen else 0) > chunkSize &&
                total > 0)) {
            total -= current.head.length + (if (current.length > 1) sepLen else 0)
            current.remove(0)
          }
        }
      }
      current += d
      total += len + (if (current.length > 1) sepLen else 0)
    }
    joinDocs(current.toSeq, separator).foreach(docs += _)
    docs.toSeq
  }

  /** Catalyst-facing wrapper. */
  def chunkArray(text: UTF8String, size: Int, overlap: Int): ArrayData = {
    val pieces = split(text.toString, size, overlap)
    new GenericArrayData(pieces.map(UTF8String.fromString).toArray[Any])
  }
}

/** `chunk_text(string, chunkSize, chunkOverlap)` -> array<string>. */
case class ChunkText(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with Serializable {
  override def prettyName: String = "chunk_text"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, s: Any, o: Any): Any =
    TextChunker.chunkArray(
      t.asInstanceOf[UTF8String], s.asInstanceOf[Int], o.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s, o) =>
      s"${ev.value} = graft.functions.TextChunker.chunkArray($t, $s, $o);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
