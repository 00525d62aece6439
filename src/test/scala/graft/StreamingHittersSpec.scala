package graft

import graft.streaming.StreamingHitters
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingHittersSpec extends AnyFunSuite with SharedSpark {

  private def skewed(seed: Int, n: Int): Vector[String] = {
    val rnd = new scala.util.Random(seed)
    rnd.shuffle(
      ((0 until n).map(i => s"tail_${seed}_$i") ++
        (0 until 4).flatMap(i => Seq.fill((i + 1) * n / 4)(s"hot_$i"))).toVector)
  }

  test("streaming shard summaries keep the per-shard retention guarantee") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 30
    val input = MemoryStream[String]
    val q = StreamingHitters.hitterSummaries(input.toDS(), k)
      .writeStream.format("memory").queryName("hitters")
      .outputMode(OutputMode.Update()).start()
    // three differently-skewed batches — the guarantee must hold for
    // the CONCATENATED stream no matter how it was batched
    val batches = Seq(skewed(1, 800), skewed(2, 1200), skewed(3, 600))
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    // latest generation per shard = the final summaries
    val rows = spark.table("hitters")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val latest = rows.groupBy(_._1).values.flatMap { rs =>
      val g = rs.map(_._2).max
      rs.filter(_._2 == g).toSeq
    }.map(r => (r._3, r._4)).toMap

    val all = batches.flatten
    val byShard = all.groupBy(StreamingHitters.shardOf)
    byShard.foreach { case (_, items) =>
      val nShard = items.size
      val exact = items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      exact.foreach { case (t, c) =>
        // anything over the shard deficit bound is retained...
        if (c > nShard / (k + 1)) {
          assert(latest.contains(t), s"lost hitter $t (freq $c, shard n $nShard)")
          // ...with a counter that never overcounts and undershoots by
          // at most the bound
          assert(latest(t) <= c && c - latest(t) <= nShard / (k + 1))
        }
      }
    }
    // the dominating items survived end-to-end
    (0 until 4).foreach(i => assert(latest.contains(s"hot_$i")))
  }

  test("batch dataset takes the same path: one fold per shard from empty state") {
    import spark.implicits._
    val k = 25
    val data = skewed(9, 1000)
    val out = StreamingHitters.hitterSummaries(data.toDS(), k)
      .collect().map(s => (s.item, s.cnt)).toMap
    val byShard = data.groupBy(StreamingHitters.shardOf)
    byShard.foreach { case (_, items) =>
      val nShard = items.size
      items.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
        .filter { case (_, c) => c > nShard / (k + 1) }
        .foreach { case (t, c) =>
          assert(out.contains(t) && out(t) <= c)
        }
    }
  }
}
