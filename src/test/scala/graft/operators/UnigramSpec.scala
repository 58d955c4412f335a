package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Ground-truth tests for the unigram-LM (SentencePiece-family) trainer:
  * the Viterbi E-step is proven arg-max by exhaustive enumeration, and
  * the full EM ledger is replayed by an independent local reference.
  */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  /** All segmentations of `w` as (pieces, mask), mask bit j-1 ⇔ cut
    * before position j — the oracle's brute-force enumeration. */
  private def allSegs(w: String): Seq[(Seq[String], Long)] =
    (0L until (1L << (w.length - 1))).map { mask =>
      val cuts = 0 +: (1 until w.length)
        .filter(j => (mask & (1L << (j - 1))) != 0L) :+ w.length
      (cuts.sliding(2).map { case Seq(a, b) => w.substring(a, b) }.toSeq, mask)
    }

  test("viterbiSegment == exhaustive arg-max under (score, -pieces, -mask)") {
    // adversarial scores: exact ties between [ab] and [a,b] forms so the
    // tie-break order is what's under test
    val score = Map("a" -> -10L, "b" -> -10L, "c" -> -10L, "d" -> -35L,
      "ab" -> -20L, "bc" -> -20L, "abc" -> -31L, "cd" -> -18L,
      "bcd" -> -28L, "abcd" -> -61L)
    for (w <- Seq("abc", "abcd", "abab", "dcba", "aabbcc", "abcabc")) {
      val valid = allSegs(w).filter(_._1.forall(score.contains))
      assert(valid.nonEmpty)
      val best = valid.maxBy { case (ps, mask) =>
        (ps.map(score).sum, -ps.length, -mask)
      }
      val got = Unigram.viterbiSegment(w, score, maxPieceLen = 4)
      assert(got == best._1,
        s"$w: viterbi $got != exhaustive arg-max ${best._1}")
    }
    // coverage fallback: a word with an uncovered char splits to chars
    assert(Unigram.viterbiSegment("axb", Map("a" -> -1L, "b" -> -1L), 4) ==
      Seq("a", "x", "b"))
  }

  test("viterbiSegment: words over 62 chars take the char-split branch") {
    // the >62 guard (maxWordLen contract; hard Long-mask limit is L>=65)
    // is unreachable by the exhaustive oracle (allSegs enumerates 2^(L-1)
    // masks), so the branch gets a direct assertion: even though "aa"
    // scores better than two "a"s, an overlong word must char-split
    val score = Map("a" -> -10L, "aa" -> -1L)
    for (len <- Seq(63, 64, 65, 100)) {
      val w = "a" * len
      assert(Unigram.viterbiSegment(w, score, maxPieceLen = 4) ==
        Seq.fill(len)("a"), s"len=$len")
    }
    // and at exactly 62 the DP still runs: pairs win over singles
    assert(Unigram.viterbiSegment("a" * 62, score, maxPieceLen = 4) ==
      Seq.fill(31)("aa"))
  }

  test("unigramTrain: ledger replays under an independent local reference") {
    val docs = Seq(
      (0L, "abab abab cd cd abcd"),
      (1L, "abab cd ab ab"),
      (2L, "abcd abcd dd")
    ).toDF("doc_id", "text")
    val (rounds, maxLen, vsize) = (2, 3, 4)
    val got = Unigram.unigramTrain(docs, rounds = rounds,
        maxPieceLen = maxLen, vocabSize = vsize)
      .orderBy($"round", $"piece")
      .as[(Int, String, Long, Long, Long)].collect()

    // local reference, formulated from occurrence lists not grids
    val words = Seq("abab", "cd", "abcd", "ab", "dd").map { w =>
      w -> docs.as[(Long, String)].collect()
        .flatMap(_._2.split(" ")).count(_ == w).toLong
    }.filter(_._2 > 0)
    val seedCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; s <- 0 until w.length;
         l <- 1 to math.min(maxLen, w.length - s))
      seedCnt.updateWith(w.substring(s, s + l)) {
        case Some(x) => Some(x + c); case None => Some(c) }
    val chars = seedCnt.keys.filter(_.length == 1).toSeq
    val multi = seedCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(vsize).map(_._1)
    val vocab = (chars ++ multi).sorted
    val v = vocab.length
    var cnts = vocab.map(p => p -> seedCnt(p)).toMap
    val ref = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long)]
    for (r <- 0 to rounds) {
      val total = cnts.values.sum
      val score = vocab.map(p =>
        p -> math.round(1e6 * math.log((cnts(p) + 1.0) / (total + v)))).toMap
      vocab.foreach(p => ref += ((r, p, cnts(p), total, score(p))))
      if (r < rounds) {
        val usage = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        for ((w, c) <- words) {
          val valid = allSegs(w).filter(_._1.forall(p =>
            p.length <= maxLen && score.contains(p)))
          val best = valid.maxBy { case (ps, mask) =>
            (ps.map(score).sum, -ps.length, -mask) }
          best._1.foreach(p => usage(p) += c)
        }
        cnts = vocab.map(p => p -> usage(p)).toMap
      }
    }
    assert(got.toSeq == ref.toSeq.sortBy(x => (x._1, x._2)),
      s"ledger mismatch:\n got ${got.toSeq}\n ref ${ref.toSeq.sortBy(x => (x._1, x._2))}")
    // sanity: EM actually moved counts (round 1 differs from round 0)
    val r0 = got.filter(_._1 == 0).map(x => x._2 -> x._3).toMap
    val r1 = got.filter(_._1 == 1).map(x => x._2 -> x._3).toMap
    assert(r0 != r1, "EM round must change usage counts on this corpus")
  }

  test("pruneVocab: loss == brute-force re-segmentation delta; keep order total") {
    val docs = Seq(
      (0L, "abab abab cd cd abcd"),
      (1L, "abab cd ab ab"),
      (2L, "abcd abcd dd")
    ).toDF("doc_id", "text")
    val (rounds, maxLen, vsize, keepN) = (2, 3, 4, 2)
    val got = Unigram.pruneVocab(docs, rounds = rounds, maxPieceLen = maxLen,
        vocabSize = vsize, keep = keepN)
      .as[(String, Long, Boolean)].collect().toSeq

    // local reference: re-train (the UnigramSpec train reference), then
    // loss per used multi-char piece by exhaustive masks without it
    val words = Seq("abab", "cd", "abcd", "ab", "dd").map { w =>
      w -> docs.as[(Long, String)].collect()
        .flatMap(_._2.split(" ")).count(_ == w).toLong
    }.filter(_._2 > 0)
    val seedCnt = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; s <- 0 until w.length;
         l <- 1 to math.min(maxLen, w.length - s))
      seedCnt.updateWith(w.substring(s, s + l)) {
        case Some(x) => Some(x + c); case None => Some(c) }
    val chars = seedCnt.keys.filter(_.length == 1).toSeq
    val multi = seedCnt.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(vsize).map(_._1)
    val vocab = (chars ++ multi).sorted
    val v = vocab.length
    var cnts = vocab.map(p => p -> seedCnt(p)).toMap
    var score: Map[String, Long] = Map.empty
    for (r <- 0 to rounds) {
      val total = cnts.values.sum
      score = vocab.map(p =>
        p -> math.round(1e6 * math.log((cnts(p) + 1.0) / (total + v)))).toMap
      if (r < rounds) {
        val usage = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        for ((w, c) <- words) {
          val valid = allSegs(w).filter(_._1.forall(p =>
            p.length <= maxLen && score.contains(p)))
          val best = valid.maxBy { case (ps, mask) =>
            (ps.map(score).sum, -ps.length, -mask) }
          best._1.foreach(p => usage(p) += c)
        }
        cnts = vocab.map(p => p -> usage(p)).toMap
      }
    }
    def bestScore(w: String, sc: Map[String, Long]): Long =
      allSegs(w).filter(_._1.forall(p => p.length <= maxLen && sc.contains(p)))
        .map(_._1.map(sc).sum).max
    val loss = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for ((w, c) <- words) {
      val valid = allSegs(w).filter(_._1.forall(p =>
        p.length <= maxLen && score.contains(p)))
      val best = valid.maxBy { case (ps, mask) =>
        (ps.map(score).sum, -ps.length, -mask) }
      val bs = best._1.map(score).sum
      best._1.distinct.filter(_.length >= 2).foreach { p =>
        loss(p) += c * (bs - bestScore(w, score - p))
      }
    }
    val refRanked = multi.map(p => (p, loss(p)))
      .sortBy { case (p, l) => (-l, p) }
    val refKept = refRanked.take(keepN).map(_._1).toSet
    val ref = multi.sorted.map(p => (p, loss(p), refKept.contains(p)))
    assert(got == ref, s"\n got $got\n ref $ref")
    // a truly load-bearing piece must carry positive loss
    assert(got.exists(_._2 > 0), "fixture must produce a positive loss")
  }

  test("segmentWords: per-word pieces joined, other columns preserved") {
    val model = Map("a" -> -10L, "b" -> -10L, "ab" -> -15L, "c" -> -12L)
    val df = Seq((1L, "abc"), (2L, "ab"), (3L, "abc")).toDF("id", "w")
    val got = Unigram.segmentWords(df, model, wordCol = "w")
      .orderBy($"id").as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "abc", "ab c"), (2L, "ab", "ab"),
      (3L, "abc", "ab c")))
  }
}
