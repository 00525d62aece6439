package graft

import graft.pipeline.{Decontamination, Dedup, SequencePacker, Sampling, TextAnalysis, PackedDoc}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The round-5 training-data operators: repetition metrics (q61), the
  * Gopher gate (q62), decontamination (q63), sequence packing (q64),
  * and temperature mixing (q65).
  */
class TrainingPipelineSpec extends AnyFunSuite with SharedSpark {

  private def checkProp(p: Prop): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(200)
    val res = SCTest.check(params, p)
    assert(res.passed, s"scalacheck: ${res.status}")
  }

  test("q61 repetition metrics match hand computation") {
    val rows = TextAnalysis.repetition(spark, Sf0001)
      .filter("doc_id = 0").collect()
    assert(rows.length === 1)
    // doc 0: "the fast key order sort table scan merge part window small
    // hash scan join order batch batch batch stream spark window window
    // dup" — 23 words, 17 distinct
    val r = rows.head
    assert(r.getAs[Long]("n_words") === 23L)
    assert(r.getAs[Double]("dup_word_frac") === 0.260870) // (23-17)/23 rounded
    // "batch batch" appears twice (batch batch batch), "window window" once
    // duplicated 2-grams: 22 total, "batch batch" dup -> 1 dup
    assert(r.getAs[Long]("top_word_count") === 3L) // batch and window = 3
    assert(r.getAs[Double]("top_word_frac") === 0.130435) // 3/23
  }

  test("q62 gate flags are integer-exact and composed correctly") {
    val rows = TextAnalysis.gopherGate(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      val expected = r.getAs[Boolean]("flag_words") &&
        r.getAs[Boolean]("flag_mean_len") &&
        r.getAs[Boolean]("flag_alpha") && r.getAs[Boolean]("flag_ttr")
      assert(keep === expected, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // the gate must actually split the corpus, not rubber-stamp it
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length)
  }

  test("q63 flags exactly the train docs sharing a gram with the eval split") {
    val out = Decontamination.contaminated(spark, Sf0001).collect()
    // no eval doc may appear as a flagged train doc
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(id % Decontamination.EvalMod !== Decontamination.EvalRem)
      assert(r.getAs[Long]("n_shared_grams") >= 1L)
      assert(r.getAs[Long]("n_eval_docs") >= 1L)
    }
  }

  test("q64 distributed packing equals the sequential reference fold") {
    val out = SequencePacker.pack(spark, Sf0001).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("offset_in_seq")))
    val bySource = out.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2).map(t => (t._2, t._3)).toSeq
      val ref = SequencePacker.packFold(src, sorted, SequencePacker.Budget)
      val got = rows.sortBy(_._2)
        .map(t => PackedDoc(t._1, t._2, t._3, t._4, t._5)).toSeq
      assert(got === ref, s"source $src")
    }
  }

  test("q64 packing invariants on random shards (ScalaCheck)") {
    val docsGen = Gen.listOf(Gen.chooseNum(1L, 700L)) // tokens, incl. > budget
    checkProp(Prop.forAll(docsGen) { tokenCounts: List[Long] =>
      val docs = tokenCounts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val packed = SequencePacker.packFold("s", docs, 512L)
      // order and identity preserved
      val orderOk = packed.map(_.doc_id) == docs.map(_._1)
      // seq ids start at 0, are non-decreasing, advance by at most 1
      val startOk = packed.isEmpty || packed.head.seq_id == 0L
      val monotoneOk = packed.sliding(2).forall {
        case Seq(a, b) => b.seq_id - a.seq_id >= 0L && b.seq_id - a.seq_id <= 1L
        case _ => true
      }
      // per-sequence: token sum fits the budget unless a single doc
      // overflows, and offsets are the exclusive running sum
      val seqOk = packed.groupBy(_.seq_id).forall { case (_, g) =>
        val fits = g.map(_.n_tokens).sum <= 512L || g.length == 1
        val offs = g.map(_.offset_in_seq) ==
          g.map(_.n_tokens).scanLeft(0L)(_ + _).init
        fits && offs
      }
      // greedy tightness: a new sequence starts only on genuine overflow
      val tightOk = packed.sliding(2).forall {
        case Seq(a, b) if b.seq_id > a.seq_id =>
          a.offset_in_seq + a.n_tokens + b.n_tokens > 512L
        case _ => true
      }
      orderOk && startOk && monotoneOk && seqOk && tightOk
    })
  }

  test("q65 mixing rates follow the alpha=0.5 weight formula exactly") {
    val out = Sampling.temperatureMix(spark, Sf0001)
    val rates = out.select("source", "n_src", "rate_ppm").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // recompute from the corpus
    val counts = Tables(spark, Sf0001, "documents")
      .groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val w = counts.map { case (s, n) => s -> math.floor(math.sqrt(n.toDouble) * 1000).toLong }
    val nTotal = counts.values.sum
    val wTotal = w.values.sum
    rates.foreach { case (s, nSrc, ppm) =>
      assert(nSrc === counts(s))
      val expected = math.min(1000000L, w(s) * (nTotal / 2) * 1000000L / (wTotal * nSrc))
      assert(ppm === expected, s"source $s")
    }
    // every kept row's bucket is under its rate, and re-running is identical
    val first = out.collect().map(_.toSeq)
    val second = Sampling.temperatureMix(spark, Sf0001).collect().map(_.toSeq)
    assert(first.toSeq === second.toSeq)
  }

  /** Pure-Scala re-derivation of the corpus token lists, independent of
    * the operators under test.
    */
  private def fixtureTokens(): Map[Long, Seq[String]] =
    Tables(spark, Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .toMap

  test("q74 vocab pruning drops exactly the top-K + hapax terms, keeps order") {
    val toks = fixtureTokens()
    val counts = toks.values.flatten.groupBy(identity).view.mapValues(_.size)
    val dfs = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size)
    val dropTop = counts.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(TextAnalysis.PruneTopK)
      .map(_._1).toSet
    val keep = counts.keySet.filter(t => !dropTop(t) && dfs(t) >= 2)
    val rows = TextAnalysis.vocabPrune(spark, Sf0001).collect()
    assert(rows.length === toks.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = toks(id).filter(keep)
      assert(r.getAs[Long]("n_before") === toks(id).length.toLong)
      assert(r.getAs[Long]("n_after") === expected.length.toLong)
      assert(r.getAs[String]("text_pruned") === expected.mkString(" "),
        s"doc $id: pruned text must be the order-preserved kept subsequence")
    }
    // the rule must bite in both directions on this corpus
    assert(rows.exists(r => r.getAs[Long]("n_after") < r.getAs[Long]("n_before")))
    assert(rows.exists(r => r.getAs[Long]("n_after") > 0))
  }

  test("q75 novelty: the first doc is all-novel; novel counts partition the gram space") {
    val rows = TextAnalysis.gramNovelty(spark, Sf0001).collect()
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("n_grams") > 0)
    assert(first.getAs[Long]("n_novel") === first.getAs[Long]("n_grams"),
      "the minimum doc_id can never re-see a gram")
    assert(first.getAs[Double]("novelty") === 1.0)
    // every distinct gram in the corpus is novel in exactly one doc
    val toks = fixtureTokens()
    val allGrams = toks.values.flatMap(t =>
      t.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq.distinct)
    assert(rows.map(_.getAs[Long]("n_novel")).sum ===
      allGrams.toSeq.distinct.length.toLong)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams")))
  }

  test("q76 source overlap matches a pure-Scala set computation for every pair") {
    val docs = Tables(spark, Sf0001, "documents")
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.flatMap(r =>
        r.getString(1).trim.split("\\s+").toSeq
          .sliding(3).filter(_.length == 3).map(_.mkString(" "))).toSet)
      .toMap
    val rows = TextAnalysis.sourceOverlap(spark, Sf0001).collect()
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(a < b)
      val inter = (docs(a) intersect docs(b)).size.toLong
      assert(r.getAs[Long]("n_shared") === inter, s"($a,$b) shared")
      assert(r.getAs[Long]("n_a") === docs(a).size.toLong)
      assert(r.getAs[Long]("n_b") === docs(b).size.toLong)
    }
    // every pair with a non-empty intersection must be present
    val expectedPairs = docs.keySet.toSeq.sorted.combinations(2)
      .count { case Seq(a, b) => (docs(a) intersect docs(b)).nonEmpty }
    assert(rows.length === expectedPairs)
  }

  test("q97: no near-dup pair ever straddles a split boundary") {
    val split = Dedup.q97LeakageSafeSplit(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val pairs = Dedup.minhashNearDup(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) split across partitions")
    }
    // all three splits are actually populated at fixture scale
    assert(split.values.toSet == Set("train", "valid", "test"))
    Dedup.unpersistSigs(spark, Sf0001)
  }
}
