package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Unigram language-model tokenizer training (Kudo: "Subword
  * Regularization", ACL 2018 — the SentencePiece-unigram family, the
  * production tokenizer family [[Bpe]] does not cover), as a
  * deterministic Viterbi-EM over a seeded candidate vocabulary.
  *
  * Like [[Bpe]], training runs on the WORD FREQUENCY TABLE, not the
  * corpus: the corpus is scanned once (tokenize → `groupBy(word).count`,
  * the only corpus-sized job); every EM round operates on the distinct-
  * word relation. Deterministic throughout — hard (Viterbi) EM instead
  * of expectation-weighted EM, integer-scaled log-probabilities, total
  * orders on every tie — so the whole training loop is a pure function
  * of the corpus and an oracle can replay the recurrence round by round:
  *
  *  1. SEED (round 0): candidate pieces = every substring of length
  *     ≤ `maxPieceLen` of every distinct word, count = Σ word-freq ×
  *     occurrences (overlaps count). The vocabulary is all single
  *     characters (coverage guarantee) plus the top `vocabSize`
  *     multi-character candidates by (count desc, piece asc) — fixed
  *     from here on (pruning-during-EM is a separate concern this
  *     operator deliberately excludes for determinism).
  *  2. SCORE: `score_scaled(p) = round(1e6 · ln((cnt(p)+1) / (total+|V|)))`
  *     — add-one smoothing keeps pieces that fell out of use defined.
  *     The ln is the ONLY float in the loop, computed once here and
  *     CONSUMED as the same integer by engine and oracle alike (the
  *     q_lm_score staged-evidence pattern: counts are re-derived
  *     exactly, the scaled ln is taken as staged where they match).
  *  3. E-STEP: each distinct word takes its Viterbi segmentation under
  *     the current scores — arg-max total score, ties broken by fewer
  *     pieces then smallest cut-mask (bit j−1 set ⇔ a cut before
  *     position j), a total order a brute-force oracle reproduces with
  *     `ORDER BY score DESC, n_pieces, mask`.
  *  4. M-STEP: piece counts = Viterbi usage weighted by word freq
  *     (unused pieces stay at 0); back to 2. `rounds` fixed iterations
  *     (the q_pagerank shape).
  *
  * Words longer than `maxWordLen` (> 62 would overflow the cut-mask;
  * the default is far below) are excluded from training entirely — at
  * corpus scale those are URLs/garbage, and the exclusion is mirrored
  * by the oracle.
  *
  * Output: the full per-round ledger `(round, piece, cnt, total,
  * score_scaled)`, rounds 0..`rounds`, |V| rows per round — each row
  * carrying the integer count evidence an oracle re-derives plus the
  * staged score it consumes. `modelSink` writes the same ledger as
  * parquet for the oracle's staged read.
  *
  * Scale: the vocabulary is contract-bounded (`vocabSize` + alphabet ≤
  * a few thousand rows), so the per-round collect and the broadcast
  * score map are codebook-class; the per-round job is one narrow pass
  * over the word-frequency relation (Viterbi is a per-word DP in
  * `mapPartitions` — inherently sequential per word, the funnel-DP
  * precedent) plus one partial-agg count. Nothing corpus-sized after
  * the seed scan.
  */
object Unigram {

  /** Viterbi segmentation under integer piece scores: maximizes total
    * score; ties → fewer pieces → smallest cut-mask. Package-visible for
    * the spec's brute-force arg-max proof. Returns char-split if the
    * model somehow lacks coverage (cannot happen when every char of `w`
    * is in `score`), and ALSO for words over 62 chars — the
    * maxWordLen ≤ 62 trainState contract, mirrored here. The cut-mask
    * tie-break rides a single Long whose highest interior cut bit is
    * `1L << (L-2)`, so the hard arithmetic limits are L ≥ 65 (sign bit —
    * the signed `mask < bestMask` comparison inverts) and L ≥ 66
    * (`1L << (j-1)` wraps mod 64, colliding bits reconstruct cuts never
    * on the best path); the guard sits at 62, conservatively, so that
    * apply-time segmentation and training share ONE word-length
    * contract. Training never sees longer words (trainState caps at
    * maxWordLen ≤ 62), so an overlong word at APPLY time is
    * out-of-distribution by contract — char-split is its defined
    * (valid: every char is in the vocab) segmentation. */
  private[graft] def viterbiSegment(w: String, score: Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    val L = w.length
    if (L == 0) return Seq.empty
    if (L > 62) return w.map(_.toString) // cut-mask Long bound; see scaladoc
    // dp(i): best (score, nPieces, cutMask) over prefixes w[0,i)
    val dpSc = new Array[Long](L + 1)
    val dpNp = new Array[Int](L + 1)
    val dpMask = new Array[Long](L + 1)
    val reach = new Array[Boolean](L + 1)
    reach(0) = true
    var i = 1
    while (i <= L) {
      var bestSc = 0L; var bestNp = 0; var bestMask = 0L; var found = false
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (reach(j)) {
          score.get(w.substring(j, i)) match {
            case Some(s) =>
              val sc = dpSc(j) + s
              val np = dpNp(j) + 1
              val mask = if (j == 0) dpMask(j) else dpMask(j) | (1L << (j - 1))
              if (!found || sc > bestSc ||
                  (sc == bestSc && (np < bestNp ||
                    (np == bestNp && mask < bestMask)))) {
                bestSc = sc; bestNp = np; bestMask = mask; found = true
              }
            case None =>
          }
        }
        j += 1
      }
      if (found) { dpSc(i) = bestSc; dpNp(i) = bestNp; dpMask(i) = bestMask }
      reach(i) = found
      i += 1
    }
    if (!reach(L)) return w.map(_.toString) // coverage fallback
    val mask = dpMask(L)
    val cuts = 0 +: (1 until L).filter(j => (mask & (1L << (j - 1))) != 0L) :+ L
    cuts.sliding(2).map { case Seq(a, b) => w.substring(a, b) }.toSeq
  }

  private def scoreOf(cnt: Long, total: Long, v: Int): Long =
    math.round(1e6 * math.log((cnt + 1.0) / (total + v.toDouble)))

  /** Shared training core: word table (PERSISTED — caller unpersists),
    * fixed vocab, per-round ledger, and the final-round score map. */
  private def trainState(docs: DataFrame, rounds: Int, maxPieceLen: Int,
      vocabSize: Int, maxWordLen: Int, textCol: String):
      (DataFrame, IndexedSeq[String], Map[String, Long],
        Seq[(Int, String, Long, Long, Long)]) = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16], got $rounds")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(maxWordLen <= 62, s"maxWordLen must be <= 62 (cut-mask), got $maxWordLen")
    val spark = docs.sparkSession
    import spark.implicits._

    // the one corpus-sized job: word frequency table
    val words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // seed candidates: every substring (start, len) grid cell, weighted
    // by word freq — overlapping occurrences count individually
    val subs = words.select(col("cnt"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), s =>
          transform(sequence(lit(1),
              least(lit(maxPieceLen), length(col("w")) - s + 1)),
            l => col("w").substr(s, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(vocabSize)
    // bounded collect: ≤ vocabSize + alphabet rows — codebook class
    val seed = chars.union(multi)
      .as[(String, Long)].collect().sortBy(_._1)

    val vocabArr = seed.map(_._1).toIndexedSeq
    val v = vocabArr.length
    val ledger = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long)]
    var cnts: Map[String, Long] = seed.toMap
    var lastScore: Map[String, Long] = Map.empty
    var round = 0
    while (round <= rounds) {
      val total = cnts.valuesIterator.sum
      val score = vocabArr.iterator
        .map(p => p -> scoreOf(cnts.getOrElse(p, 0L), total, v)).toMap
      lastScore = score
      vocabArr.foreach(p =>
        ledger += ((round, p, cnts.getOrElse(p, 0L), total, score(p))))
      if (round < rounds) {
        val bc = spark.sparkContext.broadcast(score)
        val usage = words.as[(String, Long)].mapPartitions { it =>
          it.flatMap { case (w, cnt) =>
            viterbiSegment(w, bc.value, maxPieceLen).map(p => (p, cnt))
          }
        }.toDF("piece", "cnt")
          .groupBy(col("piece")).agg(sum(col("cnt")).as("cnt"))
          .as[(String, Long)].collect().toMap // ≤ |V| rows
        cnts = vocabArr.iterator.map(p => p -> usage.getOrElse(p, 0L)).toMap
      }
      round += 1
    }
    (words, vocabArr, lastScore, ledger.toSeq)
  }

  def unigramTrain(docs: DataFrame, rounds: Int = 2, maxPieceLen: Int = 4,
      vocabSize: Int = 64, maxWordLen: Int = 16, textCol: String = "text",
      modelSink: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (words, _, _, ledger) =
      trainState(docs, rounds, maxPieceLen, vocabSize, maxWordLen, textCol)
    words.unpersist()
    val out = ledger.toDF("round", "piece", "cnt", "total", "score_scaled")
    modelSink.foreach(p => out.coalesce(1).write.mode("overwrite").parquet(p))
    out
  }

  /** The SentencePiece PRUNE step — the second half of unigram training
    * [[unigramTrain]] deliberately excludes from its fixed-vocab EM:
    * score every multi-character piece by its LIKELIHOOD LOSS
    *   loss(p) = Σ_w freq(w) · (bestScore(w) − bestScoreWithout_p(w))
    * (how much total Viterbi log-likelihood the corpus loses if `p` is
    * removed and its words re-segment; 0 for pieces no best segmentation
    * uses — exactly SentencePiece's utility order), then keep the top
    * `keep` by (loss desc, piece asc). Single characters are never
    * pruned (coverage guarantee), so the char-split alternative always
    * exists and every loss is well-defined. All arithmetic is sums of
    * the staged integer scores — bit-portable, so the oracle re-derives
    * every loss by brute-force mask enumeration excluding `p`.
    *
    * Output: one row per multi-char vocab piece —
    * `(piece, loss_scaled, kept)`, ordered by piece.
    *
    * Scale: one extra E-step-shaped pass (per word, one DP plus one DP
    * per DISTINCT piece its best segmentation uses — ≤ L/2 re-runs of an
    * O(L·maxPieceLen) kernel); the loss aggregation is a partial-agg sum
    * on the piece; everything else is codebook-class. */
  def pruneVocab(docs: DataFrame, rounds: Int = 2, maxPieceLen: Int = 4,
      vocabSize: Int = 64, keep: Int = 32, maxWordLen: Int = 16,
      textCol: String = "text"): DataFrame = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val spark = docs.sparkSession
    import spark.implicits._
    val (words, vocabArr, score, _) =
      trainState(docs, rounds, maxPieceLen, vocabSize, maxWordLen, textCol)
    val bc = spark.sparkContext.broadcast(score)
    val mpl = maxPieceLen
    val losses = words.as[(String, Long)].mapPartitions { it =>
      val sc = bc.value
      it.flatMap { case (w, cnt) =>
        val best = viterbiSegment(w, sc, mpl)
        val bestSc = best.iterator.map(sc).sum
        best.distinct.iterator.filter(_.length >= 2).map { p =>
          (p, cnt * (bestSc - viterbiBestScore(w, sc - p, mpl)))
        }
      }
    }.toDF("piece", "l")
      .groupBy(col("piece")).agg(sum(col("l")).as("loss_scaled"))
    val multiAll = vocabArr.filter(_.length >= 2).toDF("piece")
    // global window over ≤ vocabSize rows — codebook-class by contract,
    // not a corpus-sized single-task sort
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("loss_scaled").desc, col("piece"))
    val out = multiAll.join(losses, Seq("piece"), "left")
      .select(col("piece"),
        coalesce(col("loss_scaled"), lit(0L)).as("loss_scaled"))
      .withColumn("kept", row_number().over(w) <= keep)
      .orderBy(col("piece"))
    words.unpersist()
    out
  }

  /** Max Viterbi score only (no segmentation reconstruction — tie-breaks
    * are irrelevant to the maximum). Long.MinValue if `w` has no covering
    * segmentation under `score` (cannot happen while all chars are in). */
  private[graft] def viterbiBestScore(w: String, score: Map[String, Long],
      maxPieceLen: Int): Long = {
    val L = w.length
    if (L == 0) return 0L
    val dp = new Array[Long](L + 1)
    val reach = new Array[Boolean](L + 1)
    reach(0) = true
    var i = 1
    while (i <= L) {
      var best = Long.MinValue
      var found = false
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (reach(j)) {
          score.get(w.substring(j, i)) match {
            case Some(s) =>
              val cand = dp(j) + s
              if (!found || cand > best) { best = cand; found = true }
            case None =>
          }
        }
        j += 1
      }
      if (found) dp(i) = best
      reach(i) = found
      i += 1
    }
    if (reach(L)) dp(L) else Long.MinValue
  }

  /** Column-level tokenization: adds `pieces_joined` (space-joined
    * Viterbi pieces) for every row's `wordCol` under the scores in
    * `model` (piece → score_scaled). Batched mapPartitions like the
    * trainer's E-step. */
  def segmentWords(df: DataFrame, model: Map[String, Long],
      wordCol: String = "w", maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val idx = df.schema.fieldNames.indexOf(wordCol)
    require(idx >= 0, s"no column $wordCol")
    val inCols = df.schema.fieldNames.toIndexedSeq
    df.select(col(wordCol)).as[String].mapPartitions { it =>
      it.map(w => (w, viterbiSegment(w, bc.value, maxPieceLen).mkString(" ")))
    }.toDF(wordCol, "pieces_joined")
      .groupBy(col(wordCol))
      .agg(first(col("pieces_joined")).as("pieces_joined"))
      .join(df, Seq(wordCol))
      .select((inCols.map(col) :+ col("pieces_joined")): _*)
  }
}
