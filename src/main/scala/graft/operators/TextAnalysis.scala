package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators for a training-data pipeline (SURVEY.md §2.10):
  * token statistics, quality scoring, language ID, document fingerprinting.
  *
  * Everything is built-in-function / HOF based (whole-stage codegen, no
  * UDFs); per-document work is narrow (no shuffle), so all of these scale
  * linearly with input splits — the 100 TB cost is one scan.
  */
object TextAnalysis {

  /** Collocation (phrase) mining — adjacent-bigram LIFT, the classic
    * phrase-vocabulary step of corpus prep (word2vec-style phrase
    * detection, without its discounting knob): a bigram is a phrase
    * candidate when it occurs far more often than its parts predict,
    *   lift(a,b) = P(ab) / (P(a)·P(b)) = n_ab · N / (n_a · n_b).
    * Kept in EXACT scaled-integer arithmetic (×10^6, DECIMAL(38,0)
    * intermediates — the WordPiece-score stance), so the ranking is
    * bit-portable and the face hash-gates against a DuckDB re-count.
    *
    * Scale shape: a handful of narrow projections over the corpus
    * (bigram pairs via an array zip, unigram counts, the 1-row total —
    * each a partial-agg groupBy that combines map-side); unigram
    * counts join back onto the bigram relation, and both sides are
    * corpus-VOCABULARY sized, far smaller than the corpus; top-k is a
    * TakeOrdered, no window. `minCount` drops hapax bigrams BEFORE the
    * arg-max — a pair of two hapax words has maximal lift by
    * construction (the WordPiece `n >= 2` lesson).
    *
    * Output: (a, b, pair_count, lift_ppm) — top `k` by
    * (lift desc, a, b). */
  def collocations(docs: DataFrame, textCol: String = "text",
      minCount: Long = 2L, k: Int = 20): DataFrame = {
    val toksL = tokens(col(textCol)).as("l")
    val d = docs.select(toksL)
    val bg = d.select(explode(arrays_zip(
        slice(col("l"), lit(1), size(col("l")) - 1).as("la"),
        slice(col("l"), lit(2), size(col("l")) - 1).as("lb"))).as("p"))
      .select(col("p.la").as("a"), col("p.lb").as("b"))
      .filter(length(col("a")) > 0 && length(col("b")) > 0)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
    val uni = d.select(explode(col("l")).as("u"))
      .filter(length(col("u")) > 0)
      .groupBy(col("u")).agg(count(lit(1)).as("c"))
    // N = Σ unigram counts — a lazy 1-row broadcast (the oracle's `tot`
    // CTE), NOT an eager driver count: the returned plan stays
    // composable and the corpus is not scanned a third time
    val tot = uni.agg(sum(col("c")).as("nn"))
    bg.filter(col("n") >= minCount)
      .join(uni.withColumnRenamed("u", "a").withColumnRenamed("c", "ca"), "a")
      .join(uni.withColumnRenamed("u", "b").withColumnRenamed("c", "cb"), "b")
      .crossJoin(broadcast(tot))
      .withColumn("lift_ppm",
        expr("CAST(CAST(n AS DECIMAL(38,0)) * CAST(nn AS DECIMAL(38,0)) " +
          "* 1000000L div " +
          "(CAST(ca AS DECIMAL(38,0)) * CAST(cb AS DECIMAL(38,0))) AS BIGINT)"))
      .select(col("a"), col("b"), col("n").as("pair_count"), col("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Minimal per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. Tiny on purpose: broadcast as literals into the
    * plan, no side files. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "nicht", "von", "ist", "mit"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"))

  private def stopArray(lang: String): Column =
    array(stopwords(lang).map(lit): _*)

  /** Count of tokens present in `langWords` (non-distinct). */
  private def matches(toks: Column, lang: String): Column =
    size(filter(toks, t => array_contains(stopArray(lang), t)))

  /** Token/char statistics per document.
    *
    * The token array is materialized ONCE into a projection column —
    * repeating the `tokens(...)` subtree per consumer re-runs the split per
    * use (HOF subtrees aren't reliably CSE'd); `regexp_count` avoids
    * allocating a match array just to take its size. */
  def stats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    docs.withColumn("__toks", tokens(col(textCol)))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_chars_calc", length(col(textCol)))
      .withColumn("n_punct", regexp_count(col(textCol), lit("\\p{Punct}")).cast("int"))
      .withColumn("n_bpeish", bpeishCount(col(textCol)).cast("int"))
      .withColumn("avg_token_len",
        (length(regexp_replace(col(textCol), "\\s+", "")).cast("double") /
          size(toks)))
      .drop("__toks")
  }

  /** Heuristic quality score in [0,1]: stopword hit-rate, token-length
    * plausibility, punctuation/digit load. The shape (cheap per-row ratios,
    * weighted sum, filter threshold downstream) is the standard pre-training
    * quality gate; weights are illustrative. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    val nTok = size(toks).cast("double")
    val stopRatio = matches(toks, "en").cast("double") / greatest(nTok, lit(1.0d))
    val avgLen = length(regexp_replace(col(textCol), "\\s+", "")).cast("double") /
      greatest(nTok, lit(1.0d))
    val lenScore = when(avgLen.between(2.0d, 12.0d), 1.0d).otherwise(0.0d)
    val punctRatio = regexp_count(col(textCol), lit("\\p{Punct}"))
      .cast("double") / greatest(length(col(textCol)).cast("double"), lit(1.0d))
    val digitRatio = regexp_count(col(textCol), lit("[0-9]"))
      .cast("double") / greatest(length(col(textCol)).cast("double"), lit(1.0d))
    docs.withColumn("__toks", tokens(col(textCol)))
      .withColumn("quality",
        round(least(lit(1.0d), greatest(lit(0.0d),
          lit(0.4d) * least(stopRatio * 5.0d, lit(1.0d)) +
            lit(0.3d) * lenScore +
            lit(0.15d) * (lit(1.0d) - least(punctRatio * 10.0d, lit(1.0d))) +
            lit(0.15d) * (lit(1.0d) - least(digitRatio * 10.0d, lit(1.0d))))), 4))
      .drop("__toks")
  }

  /** Per-doc rounded feature vector shared by [[qualityClassifier]]'s
    * trainer and scorer (and mirrored verbatim by the oracle SQL):
    * stopword hit-rate, chars-per-token, punctuation load, digit load —
    * each rounded to 6 decimals so every engine's dot product starts from
    * identical doubles. */
  private def classifierFeatures(textCol: String): Seq[Column] = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    Seq(
      round(matches(toks, "en").cast("double") / greatest(nTok, lit(1.0d)), 6),
      round(length(regexp_replace(col(textCol), "\\s+", "")).cast("double") /
        greatest(nTok, lit(1.0d)), 6),
      round(regexp_count(col(textCol), lit("\\p{Punct}")).cast("double") /
        greatest(length(col(textCol)).cast("double"), lit(1.0d)), 6),
      round(regexp_count(col(textCol), lit("[0-9]")).cast("double") /
        greatest(length(col(textCol)).cast("double"), lit(1.0d)), 6))
  }

  /** TRAINED quality classifier — the learned-filter slot of a
    * pretraining pipeline (the GPT-3/LLaMA-class "quality classifier
    * scored over the whole corpus"), built fully deterministic and
    * engine-auditable:
    *
    *  - features: the four rounded per-doc ratios of
    *    [[classifierFeatures]] (their arithmetic is the oracle-proven
    *    q_text_quality feature set);
    *  - weak labels: the rule-based [[qualityScore]] ≥ 0.5 over a
    *    bounded ordered sample — the self-training shape; production
    *    swaps in human labels or a reference corpus without touching the
    *    machinery;
    *  - trainer: driver-local full-batch logistic-regression gradient
    *    descent, fixed iterations/learning rate on ≤ `trainSample` rows
    *    — deterministic on any cluster (the Lloyd-trainer contract);
    *    ONLY training is driver-side, scoring stays distributed;
    *  - scorer: z = (((w₀ + w₁f₁) + w₂f₂) + …) as one fixed-shape
    *    left-associated column expression — bit-identical in any IEEE
    *    engine given the staged weights, so `keep = z > 0` has no
    *    boundary risk, and the sigmoid (monotone) never enters the
    *    gated path.
    *
    * `weightsSink` stages (i, w) so an external engine re-derives every
    * z and keep decision from raw text — only the trainer stays
    * engine-side (the staged-quantizer epistemic split). */
  def qualityClassifier(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", trainSample: Int = 10000,
      iters: Int = 300, lr: Double = 0.5,
      weightsSink: Option[String] = None): DataFrame = {
    val feats = classifierFeatures(textCol)
    val sample = qualityScore(docs, textCol)
      .withColumn("__f", array(feats: _*))
      .orderBy(col(idCol)).limit(trainSample)
      .select(col("__f"), (col("quality") >= 0.5d).cast("int").as("__y"))
      .collect().map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
    require(sample.nonEmpty, "empty corpus")
    val d = feats.length
    val w = new Array[Double](d + 1) // w(0) = bias
    val n = sample.length.toDouble
    var it = 0
    while (it < iters) {
      val g = new Array[Double](d + 1)
      sample.foreach { case (f, y) =>
        var z = w(0); var j = 0
        while (j < d) { z += w(j + 1) * f(j); j += 1 }
        val err = 1.0d / (1.0d + math.exp(-z)) - y
        g(0) += err; j = 0
        while (j < d) { g(j + 1) += err * f(j); j += 1 }
      }
      var j = 0
      while (j <= d) { w(j) -= lr * g(j) / n; j += 1 }
      it += 1
    }
    weightsSink.foreach { path =>
      import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
      val rows = w.zipWithIndex.map { case (wi, i) =>
        org.apache.spark.sql.Row(i, wi) }.toList
      docs.sparkSession.createDataFrame(
          java.util.Arrays.asList(rows: _*),
          StructType(Seq(StructField("i", IntegerType, nullable = false),
            StructField("w", DoubleType, nullable = false))))
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
    val z = feats.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, j)) => acc + lit(w(j + 1)) * f
    }
    docs.withColumn("z_quality", round(z, 6)).withColumn("keep", z > 0.0d)
  }

  /** Stopword-profile language ID with CJK short-circuit; deterministic
    * alphabetical-descending tie-break via lexicographic struct max. */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("__toks")
    val scored = array(stopwords.keys.toSeq.sorted.map(l =>
      struct(matches(toks, l).as("score"), lit(l).as("lang"))): _*)
    val best = array_max(scored)
    // rlike short-circuits on first CJK char (extract_all would scan + allocate)
    val hasCjk = col(textCol).rlike("[\\x{4E00}-\\x{9FFF}]")
    docs.withColumn("__toks", tokens(col(textCol)))
      .withColumn("lang_pred",
        when(hasCjk, lit("zh"))
          .when(best.getField("score") > 0, best.getField("lang"))
          .otherwise(lit("und")))
      .drop("__toks")
  }

  /** Per-document Unicode SCRIPT histogram — the script-mix audit a
    * crawl-cleanup pass runs alongside language ID: mixed-script
    * documents flag lookalike spam ("Ⅴiagra"), mojibake remnants, and
    * boilerplate-injected pages that a token-level langid scores
    * confidently wrong. Counts per script ride codegen'd
    * `regexp_count` character classes (Java `\p{IsX}` ≡ RE2 `\p{X}`
    * for these five majority scripts — engine-portable, the property
    * the oracle parity rests on); `main_other` is the dominant
    * NON-Latin script (the langid struct-max tie convention: count,
    * then name descending; `none` when no non-Latin char), `mixed` is
    * ≥ 2 scripts present. Narrow one-pass projection, no shuffle.
    *
    * Output: `(…, n_latin, n_cyrillic, n_greek, n_han, n_arabic,
    * main_other, mixed)`. */
  def scriptMix(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val scripts = Seq("arabic" -> "\\p{IsArabic}", "cyrillic" -> "\\p{IsCyrillic}",
      "greek" -> "\\p{IsGreek}", "han" -> "\\p{IsHan}")
    def cnt(pat: String): Column =
      regexp_count(col(textCol), lit(pat)).cast("long")
    val nLatin = cnt("\\p{IsLatin}")
    val scored = array(scripts.map { case (n, p) =>
      struct(cnt(p).as("n"), lit(n).as("s"))
    }: _*)
    val best = array_max(scored)
    val present = (nLatin > 0).cast("int") +
      scripts.map { case (_, p) => (cnt(p) > 0).cast("int") }
        .reduce(_ + _)
    docs.withColumn("n_latin", nLatin)
      .withColumn("n_cyrillic", cnt("\\p{IsCyrillic}"))
      .withColumn("n_greek", cnt("\\p{IsGreek}"))
      .withColumn("n_han", cnt("\\p{IsHan}"))
      .withColumn("n_arabic", cnt("\\p{IsArabic}"))
      .withColumn("main_other",
        when(best.getField("n") > 0, best.getField("s"))
          .otherwise(lit("none")))
      .withColumn("mixed", present >= 2)
  }

  /** Hashed character-bigram buckets of a text column — the fastText-
    * shape feature map shared by [[langProfileTrain]] and
    * [[langProfilePredict]]: every 2-character window, Karp–Rabin folded
    * ([[graft.functions.TextFunctions.polyHash]] — engine-portable, the
    * oracle re-derives it per code point) mod `buckets`. */
  private def charBigramBuckets(text: Column, buckets: Int): Column =
    when(length(text) < 2, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(1), length(text) - 1),
        i => pmod(polyHash(text.substr(i, lit(2))), lit(buckets.toLong))))

  /** Train a character-n-gram language-profile classifier (the fastText
    * shape, deterministic): per (label, bucket) bigram counts over the
    * LABELED corpus, add-one-smoothed log-probabilities
    * `ln_scaled = round(1e6 · ln((cnt+1)/(total_label+B)))`. Model rows
    * cover the full label × bucket grid so unseen buckets carry their
    * smoothed penalty explicitly. The counts are the oracle-checkable
    * evidence; the scaled ln is the one float, staged and consumed (the
    * q_lm_score epistemics). The collect is ≤ |labels| × `buckets` rows
    * — codebook class, bounded by contract.
    *
    * Output / staged columns: `(label, bucket, cnt, total, ln_scaled)`. */
  def langProfileTrain(docs: DataFrame, labelCol: String = "lang",
      textCol: String = "text", buckets: Int = 128,
      modelSink: Option[String] = None): DataFrame = {
    require(buckets >= 2 && buckets <= 4096,
      s"buckets must be in [2, 4096] (labels × B rows collect), got $buckets")
    val spark = docs.sparkSession
    val counts = docs.select(col(labelCol).as("label"),
        explode(charBigramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy(col("label"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .collect() // ≤ labels × buckets rows — bounded codebook class
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val labels = counts.keysIterator.map(_._1).toSeq.distinct.sorted
    val totals = labels.map(l =>
      l -> counts.iterator.filter(_._1._1 == l).map(_._2).sum).toMap
    val grid = for { l <- labels; b <- 0L until buckets.toLong } yield {
      val c = counts.getOrElse((l, b), 0L)
      val t = totals(l)
      (l, b, c, t, math.round(1e6 * math.log((c + 1.0) / (t + buckets.toDouble))))
    }
    val model = spark.createDataFrame(grid.toIndexedSeq)
      .toDF("label", "bucket", "cnt", "total", "ln_scaled")
    modelSink.foreach(p =>
      model.coalesce(1).write.mode("overwrite").parquet(p))
    model
  }

  /** Classify documents under a trained [[langProfileTrain]] model:
    * per-doc bucket counts × the model's `ln_scaled` summed per label
    * (exact integer arithmetic once the model is fixed), argmax with the
    * deterministic (score desc, label asc) tie-break. The model
    * broadcasts (codebook-bounded); the per-doc side is one explode +
    * two partial-agg aggregations — nothing corpus-sized shuffles wide.
    * Output: `(idCol, lang_pred, score_scaled)`. Documents shorter than
    * one bigram yield no row (no evidence, no claim). */
  def langProfilePredict(docs: DataFrame, model: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 128): DataFrame = {
    val perDoc = docs.select(col(idCol),
        explode(charBigramBuckets(col(textCol), buckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_scaled").desc, col("label"))
    perDoc
      .join(broadcast(model.select(col("label"), col("bucket"),
        col("ln_scaled"))), Seq("bucket"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("c") * col("ln_scaled")).as("score_scaled"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("lang_pred"), col("score_scaled"))
  }

  /** Token-level TF-IDF via two aggregations (SURVEY §2.10).
    *
    * tf = term count within a doc; df = docs containing the term;
    * idf = ln((N+1)/(df+1)) + 1 (smoothed). One declarative plan — explode →
    * two groupBys → a shuffle join on term (df is one row per distinct term,
    * unbounded at corpus scale) plus a broadcast of the 1-row corpus count.
    * No driver-side action anywhere.
    */
  def tfidf(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // df has one row per DISTINCT TERM — unbounded at corpus scale, so it
    // joins by shuffle on term (both sides are already term-keyed; AQE may
    // still broadcast it when it happens to be small). Only the 1-row corpus
    // count broadcasts unconditionally.
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0d) / (col("df").cast("double") + 1.0d))
            + 1.0d))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Standing document-frequency index: (term, df) over the corpus — the
    * statistic every idf-weighted scorer ([[tfidf]], [[bm25]]) needs, made
    * persistable so scoring never re-tokenizes the corpus.
    *
    * Scale: one explode pass over the text, one term-keyed aggregation;
    * the output is narrow (string, long). At cluster scale write it
    * partitioned/bucketed by a term hash so [[incrementalDf]] merges and
    * scorer lookups prune to touched buckets. */
  def dfIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df"))

  /** Fold a delta batch into a standing [[dfIndex]]: per-term df counts
    * are additive when the delta's doc ids are DISJOINT from the indexed
    * corpus (the same contract as [[Dedup.incrementalExact]] — each doc
    * is ingested exactly once), so the merge is a union of narrow
    * (term, long) rows + one term-keyed sum. The delta's TEXT is
    * tokenized once; the standing corpus's text is never re-read — the
    * O(corpus) explode happens only at index build.
    *
    * Equals `dfIndex(base ∪ delta)` exactly (property-tested in
    * TextAnalysisSpec); hash-gated end-to-end as `q_text_df_inc`.
    * The additive merge silently DOUBLE-COUNTS a re-delivered doc id —
    * front-door at-least-once sources through [[Dedup.guardReingest]]
    * (guarded face hash-gated as `q_text_df_guard`). */
  def incrementalDf(index: DataFrame, delta: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    index.select(col("term"), col("df"))
      .unionByName(dfIndex(delta, idCol, textCol))
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"))

  /** Benchmark-contamination check (decontamination): per document, how
    * many of its distinct k-gram hashes appear anywhere in `benchmark` —
    * the standard eval-set leak detector run before training.
    *
    * Scale shape: the benchmark shingle set is tiny relative to the corpus
    * (eval sets are thousands of docs), so it is distinct-collapsed and
    * BROADCAST; the corpus side is a narrow explode → broadcast semi-join →
    * count — one aggregation keyed by doc id, the corpus text never
    * shuffles. Output: (id, n_shingles, n_contaminated, contamination). */
  def contamination(docs: DataFrame, benchmark: DataFrame, k: Int = 3,
      idCol: String = "doc_id", textCol: String = "text",
      benchTextCol: String = "text"): DataFrame = {
    val benchSh = benchmark.select(explode(array_distinct(
      shingleHashes(tokens(col(benchTextCol)), k))).as("s")).distinct()
    val d = docs.select(col(idCol),
      array_distinct(shingleHashes(tokens(col(textCol)), k)).as("sh"))
      .withColumn("n_shingles", size(col("sh")))
    val hits = d.select(col(idCol), explode(col("sh")).as("s"))
      .join(broadcast(benchSh), Seq("s"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    d.select(col(idCol), col("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") /
          greatest(col("n_shingles").cast("double"), lit(1.0d)), 6))
  }

  /** Within-document repetition score: `1 − distinct k-grams / total
    * k-grams` — the cheap degenerate-text signal (boilerplate loops,
    * keyword stuffing, decoding failures) every pre-training quality gate
    * carries. Narrow, one pass, no shuffle. */
  def repetition(docs: DataFrame, k: Int = 3, textCol: String = "text"): DataFrame = {
    val sh = col("__sh")
    docs.withColumn("__sh", shingleHashes(tokens(col(textCol)), k))
      .withColumn("n_ngrams", size(sh))
      .withColumn("n_distinct_ngrams", size(array_distinct(sh)))
      .withColumn("repetition",
        round(lit(1.0d) - col("n_distinct_ngrams").cast("double") /
          greatest(col("n_ngrams").cast("double"), lit(1.0d)), 6))
      .drop("__sh")
  }

  /** Document fingerprints: full-text hash + min-shingle (winnowing-style)
    * rolling fingerprint — identical for exact dups, stable under small
    * whitespace changes (full) / any single-shingle change (min).
    *
    * Two hash families, same structure:
    *  - `fp_full` / `fp_min_shingle` — xxhash64 (64-bit, the production
    *    collision-resistance choice; engine-private mixing);
    *  - `fp_roll` / `fp_roll_min` — Karp–Rabin polynomial rolling hash
    *    ([[graft.functions.TextFunctions.polyHash]]): engine-portable
    *    integer arithmetic an external SQL engine reproduces exactly,
    *    which is what puts the fingerprint catalog face under the DuckDB
    *    value gate. Both are one narrow pass, no shuffle. */
  def fingerprint(docs: DataFrame, textCol: String = "text", k: Int = 3): DataFrame = {
    val shs = shingles(tokens(col(textCol)), k)
    docs.withColumn("fp_full", xxhash64(col(textCol)))
      .withColumn("fp_min_shingle", array_min(hashed(shs)))
      .withColumn("fp_roll", graft.functions.TextFunctions.polyHash(col(textCol)))
      .withColumn("fp_roll_min",
        array_min(graft.functions.TextFunctions.polyHashed(shs)))
  }

  /** [[contamination]] with a Bloom-filter prefilter on the benchmark
    * membership test — IDENTICAL output (false positives are removed by the
    * exact semi-join that follows; the bloom only decides which corpus
    * postings enter it), cheaper transport at scale.
    *
    * Why it exists: [[contamination]] broadcasts the benchmark's distinct
    * shingle hashes as an exact hash relation. A full eval-suite union can
    * reach 10⁸–10⁹ distinct shingles — many GB broadcast to every executor.
    * A Bloom filter at a few % fpp is ~10 bits/item (an order of magnitude
    * smaller), and the corpus side tests it MAP-SIDE, so only true hits
    * plus the fpp-fraction of false positives ever reach the exact join —
    * the runtime-filter pattern, hand-placed. The filter is built with one
    * aggregation over the (tiny) benchmark side; its only driver-side state
    * is the sketch itself, which then rides the plan as expression state
    * ([[graft.functions.TextFunctions]] kernel-expression style).
    */
  def contaminationBloom(docs: DataFrame, benchmark: DataFrame, k: Int = 3,
      fpp: Double = 0.03, idCol: String = "doc_id", textCol: String = "text",
      benchTextCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val benchSh = benchmark.select(explode(array_distinct(
      shingleHashes(tokens(col(benchTextCol)), k))).as("s")).distinct()
    // two actions over the SMALL side only: exact count sizes the filter
    // (an undersized bloom degrades fpp, never correctness)
    val nBench = benchSh.count()
    // stat.bloomFilter NPEs on zero rows (the underlying aggregate yields
    // null); a fresh filter is the correct empty-set sketch (all-false)
    val bloom =
      if (nBench == 0L) org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
      else benchSh.stat.bloomFilter("s", nBench, fpp)
    val mightContain = Bridge.column(
      graft.functions.BloomContainsLong(Bridge.expression(col("s")), bloom))
    val d = docs.select(col(idCol),
      array_distinct(shingleHashes(tokens(col(textCol)), k)).as("sh"))
      .withColumn("n_shingles", size(col("sh")))
    // exact verify is a SHUFFLE semi-join on purpose: the premise is that
    // the exact set is too big to broadcast — after the bloom, the corpus
    // side is only true hits + fpp·clean, so both join inputs are small
    val hits = d.select(col(idCol), explode(col("sh")).as("s"))
      .filter(mightContain) // map-side: drops ~(1-fpp) of clean postings
      .join(benchSh, Seq("s"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    d.select(col(idCol), col("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") /
          greatest(col("n_shingles").cast("double"), lit(1.0d)), 6))
  }

  /** Rule-based pre-training quality gate — the Gopher (Rae et al. 2021,
    * §A1.1) / C4 (Raffel et al. 2020, §2.2) filter shape: per-document
    * boolean rules over cheap narrow signals, plus their conjunction
    * `keep`. Unlike [[qualityScore]]'s soft score, every rule is an
    * auditable predicate a pipeline owner can tune independently — and all
    * are exact integer/regex arithmetic, so the whole gate is
    * oracle-checkable in any SQL engine.
    *
    * Rules (public thresholds from the papers): word count in
    * [minWords, maxWords]; mean word length in [3, 10]; ≥ 80% of words
    * contain a letter; symbol-to-word ratio (#, …, ...) ≤ 0.1; ≤ 90% of
    * lines start with a bullet; ≤ 30% of lines end in an ellipsis; at
    * least 2 of the `requiredWords` present (Gopher's "stop word" rule —
    * the default is the paper's English list; hand a domain list for
    * non-prose corpora). Narrow one-pass plan, no shuffle. */
  def qualityRules(docs: DataFrame, textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000,
      requiredWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with")): DataFrame = {
    val toks = col("__toks")
    val lines = col("__lines")
    val nW = greatest(size(toks).cast("double"), lit(1.0d))
    val nL = greatest(size(lines).cast("double"), lit(1.0d))
    val requiredStops = requiredWords
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("n_words", size(toks))
      .withColumn("mean_word_len",
        length(regexp_replace(col(textCol), "\\s+", "")).cast("double") / nW)
      .withColumn("r_word_count", col("n_words").between(minWords, maxWords))
      .withColumn("r_mean_word_len", col("mean_word_len").between(3.0d, 10.0d))
      .withColumn("r_alpha_words",
        size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nW >= 0.8d)
      .withColumn("r_symbol_ratio",
        regexp_count(col(textCol), lit("#|\\.\\.\\.|…")).cast("double") / nW <= 0.1d)
      .withColumn("r_bullet_lines",
        size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") / nL <= 0.9d)
      .withColumn("r_ellipsis_lines",
        size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") / nL <= 0.3d)
      .withColumn("r_stopwords",
        size(filter(array(requiredStops.map(lit): _*),
          w => array_contains(toks, w))) >= 2)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") && col("r_alpha_words") &&
          col("r_symbol_ratio") && col("r_bullet_lines") &&
          col("r_ellipsis_lines") && col("r_stopwords"))
      .drop("__toks", "__lines")
  }

  /** Okapi BM25 term scores for a FIXED query-term set — the retrieval
    * scoring a contamination/attribution pipeline runs over the corpus
    * (idf-weighted, length-normalized tf; Robertson & Zaragoza 2009).
    * Output: one row per (doc, matched term) with tf, dl, the exact
    * rational factors, and the score: `score = ln(idf_arg) · tf_norm`.
    *
    * Scale: one explode pass; tf filters to the bounded query set BEFORE
    * aggregating (the shuffle carries only query-term postings); df and
    * the corpus length stats are tiny aggregates broadcast back.
    *
    * Engine-portability: `idf_arg` (the ln argument) and `tf_norm` (the
    * length-normalized tf factor) are pure rational IEEE arithmetic over
    * exact integer counts in a fixed operation tree — bit-identical in any
    * engine, hash-checked by the oracle. The final `ln` is NOT portable at
    * full precision and is therefore excluded from the oracle projection:
    * measured on this corpus, JVM `Math.log`, fdlibm `StrictMath.log`,
    * and glibc `ln` EACH pick a different last ULP for some inputs
    * (df=394: Math==glibc≠fdlibm; df=398: fdlibm==glibc≠Math), so no
    * formulation hash-matches a native engine on all inputs. The composed
    * score is hand-checked in TextAnalysisSpec instead. */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val qset = array(queryTerms.distinct.map(lit): _*)
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val dl = terms.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val tf = terms.filter(array_contains(qset, col("term")))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val nD = col("n_docs").cast("double")
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    // avgdl as ONE division (total/n), then dl/avgdl — the exact operation
    // tree the oracle mirrors; reassociating (dl*n/total) would change bits
    val avgdl = col("total_dl").cast("double") / nD
    tf.join(dl, Seq(idCol))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf_arg",
        lit(1.0d) + (nD - dfD + lit(0.5d)) / (dfD + lit(0.5d)))
      .withColumn("tf_norm",
        (tfD * (lit(k1) + lit(1.0d))) /
          (tfD + lit(k1) * (lit(1.0d) - lit(b) +
            lit(b) * (col("dl").cast("double") / avgdl))))
      .withColumn("score", log(col("idf_arg")) * col("tf_norm"))
      .select(col(idCol), col("term"), col("tf"), col("dl"),
        col("idf_arg"), col("tf_norm"), col("score"))
  }

  /** Standing inverted-index postings: (idCol, term, tf, dl) — one row
    * per (doc, distinct term), carrying the doc's token length. Built with
    * one explode pass + one (doc, term) aggregation + a narrow doc-keyed
    * join for dl. This is the relation a retrieval/attribution pipeline
    * persists so per-query scoring ([[bm25FromIndex]]) never re-reads
    * corpus text.
    *
    * Scale: write partitioned/bucketed by a term hash — query-term
    * scoring then prunes to the touched buckets. Under the disjoint-id
    * ingest contract the index is APPEND-ONLY: folding a delta batch is
    * `index.unionByName(postingsIndex(delta))` — no merge aggregation at
    * all, which is why no dedicated incremental operator exists for it.
    * A re-delivered doc id would duplicate its postings rows — front-door
    * at-least-once sources through [[Dedup.guardReingest]]. */
  def postingsIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    tf.join(dl, Seq(idCol))
  }

  /** Corpus-level stats (n_docs, total_dl) from a [[postingsIndex]] — the
    * 1-row relation [[bm25FromIndex]] broadcasts. Both fields are sums, so
    * a standing copy folds a delta additively (stats(base ∪ delta) =
    * field-wise sum); recomputing from the index as here costs one pass
    * over narrow (id, dl) rows, never text. */
  def corpusStats(postings: DataFrame, idCol: String = "doc_id"): DataFrame =
    postings.select(col(idCol), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))

  /** [[bm25]] served from a standing [[postingsIndex]] + [[corpusStats]]
    * instead of raw text — the retrieval path at corpus scale: the only
    * data read is the query terms' postings (partition-pruned when the
    * index is term-bucketed) plus a 1-row broadcast; corpus text is never
    * touched. Per-term df is counted from the filtered postings, which
    * equals [[bm25]]'s df because both count one row per (doc, term).
    *
    * The arithmetic is the IDENTICAL operation tree as [[bm25]] over the
    * same integer counts, so results are bit-equal (asserted in
    * TextAnalysisSpec), and the rational factors hash-gate against the
    * same oracle SQL as `q_text_bm25` (the `ln` caveat there applies to
    * `score` here too). */
  def bm25FromIndex(postings: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // isin, not array_contains: an In predicate reaches the parquet scan
    // as a pushed filter (row-group stats skip non-matching groups on a
    // term-sorted index) — array_contains over a literal array never
    // pushes. Plan-guarded in PlanInvariantsSpec.
    val tf = postings.filter(col("term").isin(queryTerms.distinct: _*))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nD = col("n_docs").cast("double")
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val avgdl = col("total_dl").cast("double") / nD
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_arg",
        lit(1.0d) + (nD - dfD + lit(0.5d)) / (dfD + lit(0.5d)))
      .withColumn("tf_norm",
        (tfD * (lit(k1) + lit(1.0d))) /
          (tfD + lit(k1) * (lit(1.0d) - lit(b) +
            lit(b) * (col("dl").cast("double") / avgdl))))
      .withColumn("score", log(col("idf_arg")) * col("tf_norm"))
      .select(col(idCol), col("term"), col("tf"), col("dl"),
        col("idf_arg"), col("tf_norm"), col("score"))
  }

  /** Tokenizer-coverage analysis: build the corpus's top-`vocabSize` term
    * vocabulary and measure each document's out-of-vocabulary token rate —
    * the pre-flight check before committing to a tokenizer/vocab budget
    * (high OOV → fertile ground for byte-fallback blowup).
    *
    * Vocabulary selection is the k-bounded string-tie TopK heap (count
    * desc, term asc — deterministic, engine-portable); the vocabulary is
    * then a BOUNDED relation (≤ vocabSize rows) broadcast into an
    * anti-join against the exploded corpus, so corpus text never shuffles
    * for the membership test. Rates are single int/int divisions.
    * Output: (idCol, n_tokens, n_oov, oov_rate). */
  def oovRate(docs: DataFrame, vocabSize: Int = 100,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.TopK
    require(vocabSize >= 1)
    val terms = docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val vocab = terms.groupBy(col("term")).agg(count(lit(1)).as("c"))
      .agg(TopK.topKByOrdStrTie(col("term"), col("c"), col("term"), vocabSize)
        .as("__v"))
      .select(explode(col("__v")).as("term"))
    val oov = terms.join(broadcast(vocab), Seq("term"), "left_anti")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_oov"))
    docs.select(col(idCol), size(tokens(col(textCol))).as("n_tokens"))
      .join(oov, Seq(idCol), "left")
      .withColumn("n_oov", coalesce(col("n_oov"), lit(0L)))
      .withColumn("oov_rate",
        col("n_oov").cast("double") /
          greatest(col("n_tokens").cast("double"), lit(1.0d)))
  }

  /** One-scan per-language corpus report — the summary a pipeline owner
    * checks after every ingest: volume (docs / tokens), diversity (distinct
    * sources), and exact-dup load (docs minus distinct texts). Composes
    * [[stats]] so the token definition is THE pipeline's definition, and
    * all measures come out of one partial-agg pass over the corpus
    * (`count_distinct` of an 8-byte `xxhash64(text)` rather than the text
    * itself — the same narrow-shuffle-key move as exact dedup; the
    * birthday-bound caveat documented at [[Dedup.exact]] applies). */
  def corpusReport(docs: DataFrame, langCol: String = "lang",
      sourceCol: String = "source", textCol: String = "text"): DataFrame =
    stats(docs, textCol)
      .groupBy(col(langCol).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        round(avg(col("n_tokens").cast("double")), 6).as("avg_tokens"),
        countDistinct(col(sourceCol)).as("n_sources"),
        (count(lit(1)) - countDistinct(xxhash64(col(textCol))))
          .as("n_dup_docs"))

  /** Perplexity-style quality scoring via a bucketed BIGRAM language
    * model — the KenLM/CCNet-shaped filter (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets", LREC 2020) made
    * deterministic and auditable: train an add-one-smoothed bigram LM
    * over hashed token buckets on the corpus itself, then score every
    * document by its total log-likelihood under that model. Documents
    * whose token transitions are unlike the corpus (mojibake, tag soup,
    * word salad) score low; a real pipeline trains on a trusted slice
    * and thresholds, which is this operator with `docs` = trusted and a
    * second scoring pass — here train == score, the self-perplexity
    * audit shape.
    *
    *   ll_scaled(x)  = Σ_{(b1,b2) ∈ bigrams(x)} c_{b1,b2}(x) · ln_scaled(b1,b2)
    *   ln_scaled     = round(10⁶ · ln[(c12 + 1)/(c1 + B)])
    *
    * with b = polyHash(token) mod `buckets` (the [[dsirSelect]]
    * Karp–Rabin portability contract). The model is the COMPLETE B×B
    * grid — every cell materialized with its smoothed conditional, so
    * scoring never misses — built driver-side from the ≤ B² collected
    * bigram totals (the bounded-codebook class; keep `buckets` modest).
    * The staged model carries (b1, b2, c12, c1, ln_scaled) evidence: an
    * auditor recomputes c12/c1 from raw text and consumes ln_scaled
    * only where they agree, so the only engine-side residue is the ln
    * of verified rationals (the [[dsirSelect]] gate pattern;
    * TextAnalysisSpec recomputes the ln itself). Scores are integers —
    * exact, orderable, bit-portable.
    *
    * Output: (doc_id, n_bigrams, ll_scaled) for every doc with ≥ 1
    * bigram (≥ 2 tokens). Callers rank by ll_scaled/n_bigrams (mean
    * log-likelihood) — emitted as the exact integer pair so no float
    * division enters the gate.
    *
    * Scale: ONE tokenize scan — bucket projection and adjacent-pair
    * zipping are narrow HOFs — into a map-side-combinable
    * (doc, b1, b2) count; the model is a B²-row broadcast; nothing
    * driver-side scales with the corpus. */
  def lmScore(docs: DataFrame, buckets: Int = 64, idCol: String = "doc_id",
      textCol: String = "text", modelSink: Option[String] = None,
      stagingDir: Option[String] = None): DataFrame = {
    require(buckets >= 2 && buckets <= 1024,
      s"buckets must be in [2, 1024] (B^2 rows collect), got $buckets")
    val spark = docs.sparkSession
    val bArr = transform(tokens(col(textCol)),
      t => pmod(polyHash(t), lit(buckets.toLong)))
    // adjacent pairs: zip the bucket array with itself shifted by one —
    // all narrow; docs with < 2 tokens yield no pairs and drop out
    val perDoc = Staging.stage(
      docs.select(col(idCol).as("doc_id"), bArr.as("b"))
        .select(col("doc_id"), explode(zip_with(
          slice(col("b"), lit(1), greatest(size(col("b")) - 1, lit(0))),
          slice(col("b"), lit(2), greatest(size(col("b")) - 1, lit(0))),
          (x, y) => struct(x.as("b1"), y.as("b2")))).as("p"))
        .groupBy(col("doc_id"), col("p.b1").as("b1"), col("p.b2").as("b2"))
        .agg(count(lit(1)).as("c")),
      stagingDir, "lm_counts")
    val tab = perDoc.groupBy(col("b1"), col("b2"))
      .agg(sum(col("c")).as("c12"))
      .collect() // ≤ B² rows — bounded codebook class
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val uni = tab.groupBy(_._1._1).map { case (b1, xs) =>
      b1 -> xs.values.sum
    }
    val grid = for {
      b1 <- 0L until buckets.toLong
      b2 <- 0L until buckets.toLong
    } yield {
      val c12 = tab.getOrElse((b1, b2), 0L)
      val c1 = uni.getOrElse(b1, 0L)
      val ln = math.log((c12 + 1.0) / (c1 + buckets.toDouble))
      (b1, b2, c12, c1, math.round(ln * 1e6))
    }
    val model = spark.createDataFrame(grid.toIndexedSeq)
      .toDF("b1", "b2", "c12", "c1", "ln_scaled")
    modelSink.foreach(p =>
      model.coalesce(1).write.mode("overwrite").parquet(p))
    perDoc.join(broadcast(model.select(col("b1"), col("b2"), col("ln_scaled"))),
        Seq("b1", "b2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("c") * col("ln_scaled")).as("ll_scaled"))
  }

  /** Data selection via importance resampling — the DSIR recipe (Xie,
    * Santurkar, Ma, Liang: "Data Selection for Language Models via
    * Importance Resampling", NeurIPS 2023), deterministic variant: score
    * every document by how much more likely its hashed-unigram profile is
    * under a TARGET distribution (the docs matching `targetPred` — e.g.
    * a trusted high-quality slice) than under the RAW corpus
    * distribution, then keep the top `m`.
    *
    *   score(x) = Σ_b c_b(x) · ratio_scaled(b)
    *   ratio_scaled(b) = round(10⁶ · [ln p̂_tgt(b) − ln p̂_raw(b)])
    *
    * with add-one-smoothed bucket probabilities p̂(b) = (cnt_b + 1)/(N + B)
    * and b = polyHash(token) mod `buckets` — the engine-portable
    * Karp–Rabin fold, so an external auditor re-derives the bucketing,
    * the per-doc counts, and both distributions from raw text. The ONLY
    * engine-side residue is the ln of two verified rationals: the staged
    * ratio table carries (bucket, t_cnt, r_cnt, ratio_scaled), the
    * oracle recomputes t_cnt/r_cnt independently and consumes
    * ratio_scaled only where they agree (a mismatch changes rows → the
    * hash gate fails), and TextAnalysisSpec recomputes the ln itself.
    * Scores are integer (counts × scaled log-ratios) — exact, orderable,
    * bit-portable; selection is total-ordered by (score desc, id asc).
    *
    * Scale: ONE token-explode scan feeding a map-side-combinable
    * (doc, bucket) count; bucket totals are ≤ `buckets` rows (collected —
    * the bounded codebook class, same as PQ/k-means training); scoring is
    * a broadcast join of that tiny ratio table back onto the counts; the
    * top-m is a TakeOrdered, never a global sort. */
  def dsirSelect(docs: DataFrame, targetPred: Column, m: Int,
      buckets: Int = 256, idCol: String = "doc_id", textCol: String = "text",
      ratiosSink: Option[String] = None,
      stagingDir: Option[String] = None): DataFrame = {
    require(m >= 1 && buckets >= 2, s"need m >= 1, buckets >= 2; got $m, $buckets")
    val spark = docs.sparkSession
    // three consumers below (raw totals, target totals, scores) — one
    // tokenize+count pass, staged ([[Staging]] diamond rule)
    val perDoc = Staging.stage(
      docs.select(col(idCol).as("doc_id"), targetPred.as("is_tgt"),
          explode(tokens(col(textCol))).as("term"))
        .withColumn("bucket", pmod(polyHash(col("term")), lit(buckets.toLong)))
        .groupBy(col("doc_id"), col("is_tgt"), col("bucket"))
        .agg(count(lit(1)).as("c")),
      stagingDir, "dsir_counts")

    val bucketTab = perDoc.groupBy(col("bucket"))
      .agg(sum(col("c")).as("r_cnt"),
        sum(when(col("is_tgt"), col("c")).otherwise(lit(0L))).as("t_cnt"))
      .select(col("bucket"), col("t_cnt"), col("r_cnt"))
      .collect() // ≤ `buckets` rows — bounded codebook class
    val tTot = bucketTab.map(_.getLong(1)).sum
    val rTot = bucketTab.map(_.getLong(2)).sum
    val ratios = bucketTab.map { r =>
      val lr = math.log((r.getLong(1) + 1.0) / (tTot + buckets.toDouble)) -
        math.log((r.getLong(2) + 1.0) / (rTot + buckets.toDouble))
      (r.getLong(0), r.getLong(1), r.getLong(2), math.round(lr * 1e6))
    }.toIndexedSeq
    val ratioDf = spark.createDataFrame(ratios)
      .toDF("bucket", "t_cnt", "r_cnt", "ratio_scaled")
    ratiosSink.foreach(p =>
      ratioDf.coalesce(1).write.mode("overwrite").parquet(p))

    perDoc.join(broadcast(ratioDf.select(col("bucket"), col("ratio_scaled"))),
        Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("ratio_scaled")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(m)
  }
}
