package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding token counting under a REAL merges table — the
  * token accounting a training pipeline runs with its actual tokenizer
  * rather than a whitespace/regex stand-in (q29's documented
  * limitation; this is the promoted kernel).
  *
  * Application is the textbook greedy loop (Sennrich et al. 2016, the
  * same scheme GPT-2's tokenizer applies): a word starts as its
  * character sequence; while any adjacent pair appears in the merges
  * table, the LOWEST-RANK pair is merged at every non-overlapping
  * occurrence left-to-right; the word's token count is the surviving
  * symbol count. Words are whitespace-split (no end-of-word marker —
  * the same convention the fixture table was trained with by
  * tools/make_bpe_merges.py, and the convention the golden oracle
  * re-implements independently in tools/make_golden.py).
  *
  * The merges table ships as a classpath resource
  * (graft/bpe_merges.txt, "left right" per line, rank = line number),
  * loaded once per JVM — executors resolve it from the same jar, so
  * nothing is captured in closures and the expression stays a plain
  * stateless kernel inside whole-stage codegen.
  */
object Bpe {

  /** rank of each mergeable pair, keyed "left right" (symbols can
    * collide under plain concatenation: ("ab","c") vs ("a","bc")).
    */
  lazy val ranks: java.util.HashMap[String, Integer] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing resource graft/bpe_merges.txt")
    val m = new java.util.HashMap[String, Integer]()
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      var rank = 0
      src.getLines().foreach { line =>
        val t = line.trim
        if (t.nonEmpty) {
          val sp = t.indexOf(' ')
          require(sp > 0 && sp < t.length - 1, s"malformed merge line: '$line'")
          m.put(t.substring(0, sp) + " " + t.substring(sp + 1), rank)
          rank += 1
        }
      }
    } finally src.close()
    m
  }

  /** Greedy merge of one word; exposed for spec-level golden checks. */
  def tokensOf(word: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var parts = new ArrayBuffer[String](word.length)
    word.foreach(c => parts += c.toString)
    var done = false
    while (!done && parts.length > 1) {
      // lowest-rank adjacent pair present in the table
      var best = Int.MaxValue
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.get(parts(i) + " " + parts(i + 1))
        if (r != null && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge every non-overlapping occurrence left-to-right
        val next = new ArrayBuffer[String](parts.length)
        var j = 0
        while (j < parts.length) {
          if (j + 1 < parts.length && {
                val r = ranks.get(parts(j) + " " + parts(j + 1))
                r != null && r.intValue() == best
              }) {
            next += parts(j) + parts(j + 1)
            j += 2
          } else {
            next += parts(j)
            j += 1
          }
        }
        parts = next
      }
    }
    parts.toSeq
  }

  /** Total BPE token count of a text: sum over whitespace-split words. */
  def tokenCount(text: String): Long = {
    var total = 0L
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) total += tokensOf(text.substring(start, i)).length
    }
    total
  }

  /** Catalyst-facing wrapper. */
  def tokenCountUtf8(text: UTF8String): Long = tokenCount(text.toString)
}

/** `bpe_token_count(string)` -> bigint. */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "bpe_token_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any): Any =
    Bpe.tokenCountUtf8(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Bpe.tokenCountUtf8($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
