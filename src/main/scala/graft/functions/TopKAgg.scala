package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k state: at most k (id, score) entries, kept in
  * a binary min-heap whose head is the WORST retained entry (lowest
  * score, ties broken toward the higher id — the exact inverse of the
  * output order), so an incoming candidate needs one head comparison to
  * be accepted or rejected. Insertion order never affects the result:
  * the retained SET is uniquely determined by the total order
  * (score desc, id asc), and [[sorted]] lays it out in that order.
  *
  * Scores are stored as SORTABLE Long payloads so one signed-long
  * compare is the score order in both modes: the value itself for
  * integer scores (exact at any magnitude — the fixed-point BM25 path
  * needs order past 2^53), and the IEEE total-order bit transform for
  * doubles (see [[TopKByScore.toSortable]]) — which also gives NaN a
  * consistent place (greatest, matching Spark's sort order) instead of
  * the unordered-comparison hole raw NaN doubles would open.
  */
private[graft] final class TopKHeap(val k: Int) {
  var size = 0
  val ids = new Array[Long](k)
  val scores = new Array[Long](k)

  @inline private def lt(a: Long, b: Long): Boolean = a < b

  /** a strictly worse than b under (score desc, id asc). */
  @inline private def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    lt(sa, sb) || (sa == sb && ia > ib)

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = ts; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(m); ids(i) = ids(m)
      scores(m) = ts; ids(m) = ti
      i = m
    }
  }

  def insert(id: Long, score: Long): Unit =
    if (size < k) {
      ids(size) = id; scores(size) = score; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      ids(0) = id; scores(0) = score
      siftDown()
    }

  /** Entries in output order: score desc, ties id asc. */
  def sorted: Array[(Long, Long)] = {
    val out = Array.tabulate(size)(i => (ids(i), scores(i)))
    out.sortInPlace()(Ordering.fromLessThan[(Long, Long)] { (a, b) =>
      lt(b._2, a._2) || (a._2 == b._2 && a._1 < b._1)
    })
    out
  }
}

/** `topk_by(id, score, k)` — per-group top-k of (id, score) pairs by
  * (score desc, id asc), as `array<struct<id: long, score>>` in that
  * order; the struct's score field keeps the input score type (long
  * scores compare exactly at any magnitude, doubles by IEEE order).
  *
  * This is the shuffle-shape fix for batch retrieval: a windowed
  * `row_number() ... <= k` must shuffle EVERY threshold-surviving
  * (candidate × query) row into the per-query partition before any is
  * discarded — O(N·Q) rows over the wire at corpus size N. As a typed
  * aggregate the partial (map-side) step already reduces each task's
  * contribution to ≤ k entries per query, so the exchange carries
  * O(P·Q·k) heap dumps instead. At 100 TB that is the difference
  * between shuffling the corpus per query batch and shuffling the
  * answer. Null ids/scores (none are produced by the retrieval kernels)
  * are skipped.
  */
case class TopKByScore(
    id: Expression,
    score: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other =>
      throw new IllegalArgumentException(s"topk_by k must be a foldable int, got $other")
  }

  private lazy val longScores: Boolean = score.dataType.isInstanceOf[LongType]

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(math.max(k, 0))

  override def children: Seq[Expression] = Seq(id, score, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", score.dataType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!id.dataType.isInstanceOf[LongType])
      TypeCheckResult.TypeCheckFailure(
        s"topk_by id must be BIGINT, got ${id.dataType.sql}")
    else if (!score.dataType.isInstanceOf[LongType] &&
        !score.dataType.isInstanceOf[DoubleType])
      TypeCheckResult.TypeCheckFailure(
        s"topk_by score must be BIGINT or DOUBLE, got ${score.dataType.sql}")
    else if (!kExpr.foldable || !kExpr.dataType.isInstanceOf[IntegerType])
      TypeCheckResult.TypeCheckFailure("topk_by k must be a foldable INT")
    else if (kExpr.eval(InternalRow.empty) == null)
      // a foldable CAST(NULL AS INT) passes the type check above but
      // has no usable value — reject at analysis time instead of
      // throwing from buffer creation mid-execution
      TypeCheckResult.TypeCheckFailure("topk_by k must be a non-null INT literal, got NULL")
    else TypeCheckResult.TypeCheckSuccess

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val i = id.eval(input)
    val s = score.eval(input)
    if (i != null && s != null) {
      val payload =
        if (longScores) s.asInstanceOf[Long]
        else TopKByScore.toSortable(s.asInstanceOf[Double])
      buf.insert(i.asInstanceOf[Long], payload)
    }
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) {
      buf.insert(other.ids(i), other.scores(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sorted.map { case (i, s) =>
      val sv: Any =
        if (longScores) s else TopKByScore.fromSortable(s)
      InternalRow(i, sv): Any
    })

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putLong(buf.ids(i)); bb.putLong(buf.scores(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKHeap(math.max(k, 0))
    var i = 0
    while (i < n) {
      buf.insert(bb.getLong, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(id = newChildren(0), score = newChildren(1), kExpr = newChildren(2))

  override def prettyName: String = "topk_by"
}

object TopKByScore {

  /** IEEE-754 total-order bit transform (an involution): signed-long
    * comparison of transformed bits equals the double total order
    * -Inf < … < -0.0|+0.0 < … < +Inf < NaN. Zeros are canonicalized to
    * +0.0 first so the tie-break's bit-equality cannot split them, and
    * NaN lands GREATEST — the same place Spark's sort puts it, so the
    * SQL-registered aggregate ranks NaN-scored rows first under the
    * descending output order instead of corrupting the heap with
    * unordered comparisons.
    */
  @inline private[graft] def toSortable(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    if (bits < 0L) bits ^ Long.MaxValue else bits
  }

  @inline private[graft] def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(if (s < 0L) s ^ Long.MaxValue else s)
}
