package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("collocations: exact integer lift, hapax bigrams excluded, ties ordered") {
    // tokens: 11 total; ('new','york') ×2, every other bigram ×1.
    // lift(new,york) = 2·11·10^6 / (2·2) = 5_500_000 exactly.
    val docs = Seq(
      "new york is big",
      "new york wins",
      "the cat the dog").toDF("text")
    val got = TextAnalysis.collocations(docs)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("new", "york", 2L, 5500000L)))
    // hapax words forming a hapax bigram would have maximal lift
    // (N/1·1) — minCount must exclude them, not merely rank them
    val withHapax = docs.union(Seq("qq zz").toDF("text"))
    val top = TextAnalysis.collocations(withHapax)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(!top.exists(r => r._1 == "qq"), s"hapax bigram survived: $top")
  }

  test("stats: token/char/punct counts") {
    val df = Seq((1L, "The quick, brown fox!"), (2L, "one")).toDF("doc_id", "text")
    val got = TextAnalysis.stats(df)
      .select($"doc_id", $"n_tokens", $"n_punct").as[(Long, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((4, 2)))
    assert(got(2L) == ((1, 0)))
  }

  test("BPE-ish token counting: contractions and punct split like GPT-2 pre-tok") {
    import graft.functions.TextFunctions._
    val df = Seq((1L, "don't stop"), (2L, "hello, world 42")).toDF("doc_id", "text")
    val got = df.select($"doc_id", bpeishTokens($"text").as("t"),
      bpeishCount($"text").as("n"))
      .as[(Long, Seq[String], Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L)._1 == Seq("don", "'t", " stop"))
    assert(got(2L)._1 == Seq("hello", ",", " world", " 42"))
    assert(got.forall { case (_, (toks, n)) => toks.size == n })
  }

  test("language ID: stopword profiles pick the right language") {
    val df = Seq(
      (1L, "the cat is on the roof and the dog is in the garden"),
      (2L, "el perro y el gato en la casa de los abuelos por la tarde"),
      (3L, "der hund und die katze sind nicht mit den kindern von haus"),
      (4L, "le chien et le chat dans les jardins pour une promenade"),
      (5L, "模型 训练 数据 管道"),
      (6L, "zzz qqq xxx")).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df)
      .select($"doc_id", $"lang_pred").as[(Long, String)].collect().toMap
    assert(got(1L) == "en"); assert(got(2L) == "es"); assert(got(3L) == "de")
    assert(got(4L) == "fr"); assert(got(5L) == "zh"); assert(got(6L) == "und")
  }

  test("quality: clean english text scores higher than digit/punct soup") {
    val df = Seq(
      (1L, "the system processes data with a pipeline for the training of models"),
      (2L, "@@@@ 1234 5678 !!!! #### 0000 %%%% 9999")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityScore(df)
      .select($"doc_id", $"quality").as[(Long, Double)].collect().toMap
    assert(got(1L) > 0.7, s"clean text: ${got(1L)}")
    assert(got(2L) < 0.4, s"soup: ${got(2L)}")
    assert(got.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("tfidf: rare terms outrank ubiquitous ones; tf scales the score") {
    val df = Seq(
      (1L, "spark spark spark common"),
      (2L, "flink common"),
      (3L, "duck common")).toDF("doc_id", "text")
    val scored = TextAnalysis.tfidf(df)
      .select($"doc_id", $"term", $"tf", $"tfidf").as[(Long, String, Long, Double)]
      .collect()
    val byKey = scored.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // "common" is in every doc → smallest idf; unique terms rank above it
    assert(byKey((2L, "flink"))._2 > byKey((2L, "common"))._2)
    // tf multiplies: 3×"spark" in doc 1 scores 3× a single occurrence's idf
    assert(math.abs(byKey((1L, "spark"))._2 / 3.0 -
      byKey((2L, "flink"))._2) < 1e-9)
    // every (doc, term) pair appears exactly once
    assert(scored.length == scored.map(r => (r._1, r._2)).distinct.length)
  }

  test("contamination: leaked doc flagged fully, partial overlap counted, clean doc zero") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),          // full leak
      (2L, "alpha beta gamma zeta eta theta iota"),    // shares 1 of 5 3-grams
      (3L, "totally unrelated words only here now")    // clean
    ).toDF("doc_id", "text")
    val got = TextAnalysis.contamination(docs, bench, k = 3)
      .select($"doc_id", $"n_shingles", $"n_contaminated", $"contamination")
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3, 3L, 1.0)), s"full leak: ${got(1L)}")
    assert(got(2L) == ((2L, 5, 1L, 0.2)), s"partial: ${got(2L)}")
    assert(got(3L) == ((3L, 4, 0L, 0.0)), s"clean: ${got(3L)}")
  }

  test("repetition: looped text near 1, unique text 0, short doc defined") {
    val docs = Seq(
      (1L, ("spam ham " * 20).trim),                  // 2-token loop
      (2L, "every single word appears exactly once"),
      (3L, "hi")                                      // < k tokens → 1 shingle
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, k = 3)
      .select($"doc_id", $"n_ngrams", $"n_distinct_ngrams", $"repetition")
      .as[(Long, Int, Int, Double)].collect().map(r => r._1 -> r).toMap
    // 40 tokens → 38 3-grams but only 2 distinct ("spam ham spam"/"ham spam ham")
    assert(got(1L)._2 == 38 && got(1L)._3 == 2 && got(1L)._4 > 0.9, s"${got(1L)}")
    assert(got(2L)._4 == 0.0, s"unique text must score 0: ${got(2L)}")
    assert(got(3L) == ((3L, 1, 1, 0.0)), s"short doc: ${got(3L)}")
  }

  test("qualityRules: each rule trips on its designed failure, clean doc keeps") {
    val longClean = (("the data " * 30) + "pipeline runs with and that of be have").trim
    val df = Seq(
      (1L, longClean),                                  // passes everything
      (2L, "too short but the and of"),                 // word count
      (3L, ("x " * 60 + "the of").trim),                // mean word len < 3
      (4L, (("##" + " # " * 60) + "the of and more words " * 8).trim), // symbols
      (5L, (1 to 60).map(i => s"- bullet $i the of").mkString("\n")), // bullets
      (6L, ("the of " * 30 + "a…\nb...\nc...\nd")), // ellipsis lines
      (7L, ("zz " * 60 + "qq ww").trim)                 // no required stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityRules(df, minWords = 50)
      .select($"doc_id", $"r_word_count", $"r_mean_word_len", $"r_symbol_ratio",
        $"r_bullet_lines", $"r_ellipsis_lines", $"r_stopwords", $"keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L)._8, "clean long doc must keep")
    assert(!got(2L)._2 && !got(2L)._8, "short doc fails word count")
    assert(!got(3L)._3, "single-letter soup fails mean word length")
    assert(!got(4L)._4, "symbol-heavy doc fails symbol ratio")
    assert(!got(5L)._5, "all-bullet doc fails bullet rule")
    assert(!got(6L)._6, "ellipsis-ended lines fail ellipsis rule")
    assert(!got(7L)._7 && !got(7L)._8, "no required words fails stopword rule")
  }

  test("bm25: tf raises score, rarity raises idf, length normalization works") {
    val df = Seq(
      (1L, "join join join scan filter"),     // high tf for join, short doc
      (2L, "join " + ("pad " * 40).trim),     // tf=1, long doc
      (3L, "scan filter merge row"),          // no join
      (4L, "vector index probe")              // rare term 'vector'
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(df, Seq("join", "vector"))
      .select($"doc_id", $"term", $"tf", $"score")
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // doc 1 has tf=3 and is short → strictly higher than doc 2 (tf=1, long)
    assert(got((1L, "join"))._1 == 3L && got((2L, "join"))._1 == 1L)
    assert(got((1L, "join"))._2 > got((2L, "join"))._2)
    // 'vector' appears in 1 of 4 docs, 'join' in 2 of 4 → higher idf, and
    // both have tf=1 in their single-occurrence docs; vector's doc is
    // shorter too, so its score must exceed doc 2's join score
    assert(got((4L, "vector"))._2 > got((2L, "join"))._2)
    // no row for docs without the term
    assert(!got.contains((3L, "join")))
    // hand check: doc 4 vector score vs local computation
    val n = 4.0; val dfv = 1.0
    val dl = Map(1L -> 5.0, 2L -> 41.0, 3L -> 4.0, 4L -> 3.0)
    val avgdl = dl.values.sum / n
    val idf = math.log(1.0 + (n - dfv + 0.5) / (dfv + 0.5))
    val expected = idf * (1.0 * (1.2 + 1.0)) /
      (1.0 + 1.2 * (1.0 - 0.75 + 0.75 * (dl(4L) / avgdl)))
    assert(math.abs(got((4L, "vector"))._2 - expected) < 1e-12,
      s"got ${got((4L, "vector"))._2} expected $expected")
  }

  test("dfIndex/incrementalDf: delta fold equals full recompute, chains, identity on empty") {
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("join", "hash", "scan", "row", "filter", "merge", "pad")
    def doc(id: Long) =
      (id, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val base = (0L until 20L).map(doc).toDF("doc_id", "text")
    val d1 = (100L until 110L).map(doc).toDF("doc_id", "text")
    val d2 = (200L until 205L).map(doc).toDF("doc_id", "text")

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"term").as[(String, Long)].collect().toSeq

    val idx = TextAnalysis.dfIndex(base)
    // one fold ≡ recompute over the union
    assert(rows(TextAnalysis.incrementalDf(idx, d1)) ==
      rows(TextAnalysis.dfIndex(base.unionByName(d1))))
    // chained folds ≡ one recompute over everything
    val chained = TextAnalysis.incrementalDf(TextAnalysis.incrementalDf(idx, d1), d2)
    assert(rows(chained) ==
      rows(TextAnalysis.dfIndex(base.unionByName(d1).unionByName(d2))))
    // empty delta is the identity
    assert(rows(TextAnalysis.incrementalDf(idx, d1.filter($"doc_id" < 0L))) == rows(idx))
  }

  test("guardReingest: redelivered ids dropped, fold idempotent; unguarded double-counts") {
    val rnd = new scala.util.Random(777)
    val vocab = Vector("join", "hash", "scan", "row", "filter")
    def doc(id: Long) =
      (id, Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val base = (0L until 15L).map(doc).toDF("doc_id", "text")
    val fresh = (100L until 108L).map(doc).toDF("doc_id", "text")
    // an at-least-once source redelivers 5 base docs alongside the fresh ones
    val redelivered = base.filter($"doc_id" < 5L).unionByName(fresh)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"term").as[(String, Long)].collect().toSeq

    val idx = TextAnalysis.dfIndex(base)
    val truth = rows(TextAnalysis.dfIndex(base.unionByName(fresh)))
    // guarded fold: roster hits dropped → exactly the disjoint-fold result
    val guarded = TextAnalysis.incrementalDf(idx,
      Dedup.guardReingest(redelivered, base))
    assert(rows(guarded) == truth)
    // the failure mode the guard exists for: unguarded fold double-counts
    // df for terms of the redelivered docs
    assert(rows(TextAnalysis.incrementalDf(idx, redelivered)) != truth,
      "unguarded re-ingest must deviate (else this guard face tests nothing)")
    // disjoint delta passes through the guard untouched
    assert(Dedup.guardReingest(fresh, base).count() == fresh.count())
    // guarding the SAME batch twice is idempotent: second fold is identity
    val again = TextAnalysis.incrementalDf(guarded,
      Dedup.guardReingest(redelivered, base.unionByName(redelivered)))
    assert(rows(again) == truth)
  }

  test("postingsIndex/bm25FromIndex: served scores bit-equal to bm25 from raw text") {
    val df = Seq(
      (1L, "join join join scan filter"),
      (2L, "join " + ("pad " * 40).trim),
      (3L, "scan filter merge row"),
      (4L, "vector index probe")).toDF("doc_id", "text")
    val postings = TextAnalysis.postingsIndex(df)
    // index shape: one row per (doc, distinct term), dl = token count
    val p = postings.as[(Long, String, Long, Long)].collect()
    assert(p.map(r => (r._1, r._2)).distinct.length == p.length)
    assert(p.filter(_._1 == 1L).forall(_._4 == 5L))
    assert(p.filter(_._1 == 2L).forall(_._4 == 41L))
    val q = Seq("join", "vector")
    val batch = TextAnalysis.bm25(df, q).orderBy($"doc_id", $"term").collect().toSeq
    val served = TextAnalysis.bm25FromIndex(postings,
        TextAnalysis.corpusStats(postings), q)
      .orderBy($"doc_id", $"term").collect().toSeq
    // Row equality on java.lang.Double is bits-based — this asserts the
    // factors AND the composed ln score are bit-identical, not just close
    assert(served == batch)
    // append-only ingest: postings over base ∪ delta == union of postings
    val basePart = df.filter($"doc_id" <= 2L)
    val deltaPart = df.filter($"doc_id" > 2L)
    assert(TextAnalysis.postingsIndex(basePart)
      .unionByName(TextAnalysis.postingsIndex(deltaPart))
      .orderBy($"doc_id", $"term").collect().toSeq ==
      postings.orderBy($"doc_id", $"term").collect().toSeq)
  }

  test("oovRate: vocab boundary deterministic, rates exact, in-vocab doc zero") {
    val df = Seq(
      (1L, "aa aa aa bb bb cc"),  // counts: aa=3, bb=2, cc=1
      (2L, "aa zz"),              // zz is OOV at vocabSize=2 (vocab: aa, bb)
      (3L, "aa bb")               // fully in-vocab
    ).toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(df, vocabSize = 2)
      .select($"doc_id", $"n_tokens", $"n_oov", $"oov_rate")
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6, 1L, 1.0 / 6.0)), s"got ${got(1L)}") // cc OOV
    assert(got(2L) == ((2L, 2, 1L, 0.5)))
    assert(got(3L) == ((3L, 2, 0L, 0.0)))
    // tie at the boundary: bb=2 beats cc=1; with a (count) tie the LOWER
    // term wins (string-tie contract)
    val tied = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val v1 = TextAnalysis.oovRate(tied, vocabSize = 1)
      .select($"n_oov").as[Long].head()
    assert(v1 == 1L, "one of the tied terms must be out at vocabSize=1")
  }

  test("fingerprint: deterministic, exact-dup-stable, change-sensitive") {
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, "a b c d e f h"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df)
      .select($"doc_id", $"fp_full", $"fp_min_shingle").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L)._1 != fp(3L)._1)
    // two runs give identical fingerprints (no RNG in plan)
    val fp2 = TextAnalysis.fingerprint(df).select($"fp_full").as[Long].collect().toSet
    assert(fp2 == fp.values.map(_._1).toSet)
  }

  test("fingerprint: Karp–Rabin roll matches the reference fold, both granularities") {
    // independent fold (foldLeft over code points) — the kernel must equal
    // it, and "abc" pins the cross-engine golden the DuckDB mirror computes
    def ref(s: String): Long =
      s.codePoints.toArray.foldLeft(0L)((h, c) => (h * 1000003L + c) % 1000000007L)
    assert(ref("abc") == 679322266L)
    val df = Seq((1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "abc"), (3L, "a b c d e f g")).toDF("doc_id", "text")
    val got = TextAnalysis.fingerprint(df)
      .select($"doc_id", $"fp_roll", $"fp_roll_min")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(2L)._1 == 679322266L)
    assert(got(1L)._1 == ref("The quick brown fox jumps over the lazy dog"))
    // min-shingle: lowercased word-3-gram strings, poly-hashed, min
    def shingles(s: String): Seq[String] = {
      val t = s.toLowerCase.split("\\s+").toSeq
      if (t.length < 3) Seq(t.mkString(" ")) else t.sliding(3).map(_.mkString(" ")).toSeq
    }
    for (id <- Seq(1L, 2L, 3L)) {
      val text = Map(1L -> "The quick brown fox jumps over the lazy dog",
        2L -> "abc", 3L -> "a b c d e f g")(id)
      assert(got(id)._2 == shingles(text).map(ref).min, s"doc $id")
    }
  }

  test("qualityClassifier: deterministic, learns the rule gate, staged weights score") {
    val docs = graft.Tables.documents(spark, sf0001)
    val sink = java.nio.file.Files.createTempDirectory("qc_wts").toString
    val out = TextAnalysis.qualityClassifier(docs, weightsSink = Some(sink))
      .select($"doc_id", $"z_quality", $"keep")
      .as[(Long, Double, Boolean)].collect()
    assert(out.length == docs.count())
    // determinism: fixed sample + fixed-iteration trainer
    val out2 = TextAnalysis.qualityClassifier(docs)
      .select($"doc_id", $"z_quality", $"keep")
      .as[(Long, Double, Boolean)].collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
    // the self-trained classifier must substantially agree with its weak
    // labels (rule-based quality >= 0.5) — a broken trainer or scorer
    // collapses this well below chance-level structure
    val rule = TextAnalysis.qualityScore(docs)
      .select($"doc_id", ($"quality" >= 0.5).as("y"))
      .as[(Long, Boolean)].collect().toMap
    val agree = out.count { case (id, _, keep) => keep == rule(id) }
    assert(agree.toDouble / out.length >= 0.7,
      s"classifier agrees with weak labels on only $agree/${out.length}")
    // keep is exactly the sign of z (no separate thresholding drift)
    out.foreach { case (id, z, keep) =>
      if (math.abs(z) > 1e-6) assert(keep == (z > 0), s"doc $id: z=$z keep=$keep") }
    // staged weights: 5 rows (bias + 4 features), finite
    val w = spark.read.parquet(sink).as[(Int, Double)].collect().sortBy(_._1)
    assert(w.map(_._1).toSeq == (0 to 4) && w.forall(p => !p._2.isNaN))
  }

  test("contaminationBloom: output-identical to exact contamination, any fpp") {
    val docs = graft.Tables.documents(spark, sf0001)
    val bench = docs.filter($"doc_id" < 20)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"n_shingles", $"n_contaminated", $"contamination")
      .as[(Long, Int, Long, Double)].collect().toSet
    val exact = rows(TextAnalysis.contamination(docs, bench, k = 3))
    // tight and sloppy filters alike: false positives die in the exact
    // verify, so the sketch can never change the answer
    for (fpp <- Seq(0.01, 0.3)) {
      assert(rows(TextAnalysis.contaminationBloom(docs, bench, k = 3, fpp = fpp))
        == exact, s"fpp=$fpp")
    }
    // empty benchmark: zero contamination everywhere, not a crash
    val none = TextAnalysis.contaminationBloom(
      docs, docs.filter($"doc_id" < 0), k = 3)
    assert(none.filter($"n_contaminated" =!= 0L).count() == 0)
  }

  test("nfcNormalize: composes decomposed sequences, identity on NFC text") {
    import graft.functions.TextFunctions.nfcNormalize
    val composed = "café"                // é as one codepoint
    val decomposed = "café"             // e + combining acute
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"),
      (4L, "Å ring"))                   // A + combining ring → Å
      .toDF("doc_id", "text")
    val got = df.select($"doc_id", nfcNormalize($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == composed, "decomposed must compose")
    assert(got(2L) == composed, "already-NFC is identity")
    assert(got(3L) == "plain ascii")
    assert(got(4L) == "Å ring")
    // the property the op exists for: normalized forms hash identically
    val hashes = df.filter($"doc_id" <= 2)
      .select(xxhash64(nfcNormalize($"text"))).as[Long].collect()
    assert(hashes(0) == hashes(1), "NFC-equal strings must dedup together")
    // SQL surface
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql(s"SELECT nfc_normalize('$decomposed')")
      .as[String].head() == composed)
  }

  test("corpusReport: volume, diversity, and dup load per language") {
    val df = Seq(
      (1L, "one two three", "en", "a"),
      (2L, "one two three", "en", "b"), // exact dup of 1
      (3L, "four five", "en", "a"),
      (4L, "eins zwei", "de", "c")
    ).toDF("doc_id", "text", "lang", "source")
    val rep = TextAnalysis.corpusReport(df)
      .select($"lang", $"n_docs", $"total_tokens", $"avg_tokens",
        $"n_sources", $"n_dup_docs")
      .as[(String, Long, Long, Double, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(rep("en") == (("en", 3L, 8L, 2.666667, 2L, 1L)))
    assert(rep("de") == (("de", 1L, 2L, 2.0, 1L, 0L)))
  }

  test("lmScore: fluent docs outscore word salad; short docs drop; deterministic") {
    // the corpus's dominant transition pattern is "the cat sat"-like
    // chains; doc 100 repeats transitions the model never concentrates
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val salad = Seq((100L, "mat the on cat sat zz"), (101L, "zz qq ww ee rr tt"))
    val docs = (fluent ++ salad ++ Seq((200L, "single"))).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, buckets = 32)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(!got.contains(200L), "a one-token doc has no bigrams")
    assert(got(1L)._1 == 5L, "5 bigrams in a 6-token doc")
    // compare MEAN log-likelihood (scores are exact integer pairs)
    def mean(id: Long) = got(id)._2.toDouble / got(id)._1
    assert(mean(1L) > mean(101L),
      s"fluent ${mean(1L)} must beat salad ${mean(101L)}")
    // determinism across partitionings
    val again = TextAnalysis.lmScore(docs.repartition(13), buckets = 32)
      .as[(Long, Long, Long)].collect().toSet
    assert(again == got.map { case (id, (n, ll)) => (id, n, ll) }.toSet)
  }

  test("lmScore: staged model is the complete grid with verified counts and exact ln") {
    val docs = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    try {
      val got = TextAnalysis.lmScore(docs, buckets = 8,
        modelSink = Some(s"$dir/model"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      val staged = spark.read.parquet(s"$dir/model")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(staged.length == 64, "complete 8x8 grid")
      assert(staged.map(_._3).sum == 4L, "3 + 1 corpus bigrams")
      staged.foreach { case (b1, b2, c12, c1, scaled) =>
        val ln = math.log((c12 + 1.0) / (c1 + 8.0))
        assert(math.round(ln * 1e6) == scaled, s"ln lock at ($b1,$b2)")
      }
      // per-row unigram evidence is consistent: c1 = sum of its row's c12
      staged.groupBy(_._1).foreach { case (b1, rows) =>
        assert(rows.map(_._4).distinct.length == 1)
        assert(rows.head._4 == rows.map(_._3).sum, s"c1 mismatch at $b1")
      }
      // hand-check doc 2: exactly one bigram
      assert(got(2L)._2 == 1L)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("dsirSelect: target-like docs outrank raw-like; exact m; deterministic") {
    // target slice speaks "alpha"; the raw bulk speaks "beta"; probes mix
    val docs = (
      (1L to 10L).map(i => (i, "alpha alpha alpha common", true)) ++
      (11L to 40L).map(i => (i, "beta beta beta common", false)) ++
      Seq((100L, "alpha alpha common", false),   // raw doc that LOOKS target
          (101L, "beta beta common", false))
    ).toDF("doc_id", "text", "is_tgt")
    val got = TextAnalysis.dsirSelect(docs, col("is_tgt"), m = 11)
      .as[(Long, Long)].collect()
    assert(got.length == 11, s"exactly m rows: ${got.length}")
    val picked = got.map(_._1).toSet
    assert((1L to 10L).forall(picked), "every target doc selected")
    assert(picked.contains(100L), "target-looking raw doc must outrank beta docs")
    assert(!picked.contains(101L), "beta probe must not make the alpha cut")
    // determinism across partitionings
    val again = TextAnalysis.dsirSelect(docs.repartition(13), col("is_tgt"), m = 11)
      .as[(Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("dsirSelect: staged ratio table carries verified counts and the exact ln") {
    val docs = Seq(
      (1L, "x y z", true), (2L, "x x q", false), (3L, "y q q", false))
      .toDF("doc_id", "text", "is_tgt")
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString
    try {
      TextAnalysis.dsirSelect(docs, col("is_tgt"), m = 3, buckets = 16,
        ratiosSink = Some(s"$dir/ratios")).collect()
      val staged = spark.read.parquet(s"$dir/ratios")
        .as[(Long, Long, Long, Long)].collect()
      val tTot = staged.map(_._2).sum
      val rTot = staged.map(_._3).sum
      assert(rTot == 9L, "raw total = all 9 tokens")
      assert(tTot == 3L, "target total = the 3 target-doc tokens")
      staged.foreach { case (_, t, r, scaled) =>
        val lr = math.log((t + 1.0) / (tTot + 16.0)) -
          math.log((r + 1.0) / (rTot + 16.0))
        assert(math.round(lr * 1e6) == scaled,
          s"ln lock: staged $scaled vs recomputed ${math.round(lr * 1e6)}")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("langProfile: trained bigram classifier separates scripts; ln + argmax locked") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "en", "the cat and the dog went over there"),
      (1L, "en", "they have this and that with them"),
      (2L, "ru", "и не на что он как быть с ними"),
      (3L, "ru", "что он не быть как на и с"),
      (4L, "zh", "的 是 不 我 了 人 在 有"),
      (5L, "zh", "我 在 有 人 了 不 是 的"),
      (6L, "el", "και το να του η με για δεν"),
      (7L, "el", "του η με και δεν το να για")
    ).toDF("doc_id", "lang", "text")
    val b = 64
    val model = TextAnalysis.langProfileTrain(corpus, buckets = b)
    // full grid, one row per (label, bucket); totals consistent; ln locked
    val rows = model.collect()
    assert(rows.length == 4 * b)
    rows.foreach { r =>
      val (cnt, total, ln) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ln == math.round(1e6 * math.log((cnt + 1.0) / (total + b.toDouble))))
    }
    val totals = rows.groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getLong(2)).sum }
    rows.foreach(r => assert(r.getLong(3) == totals(r.getString(0))))
    // disjoint scripts → training-set predictions recover every label
    val pred = TextAnalysis.langProfilePredict(corpus, model, buckets = b)
      .select($"doc_id", $"lang_pred").as[(Long, String)].collect().toMap
    val truth = corpus.select($"doc_id", $"lang").as[(Long, String)]
      .collect().toMap
    assert(pred == truth, s"pred $pred != truth $truth")
    // argmax tie-break: an empty-evidence doc (no bigram overlap beyond
    // smoothing) scores every label identically on unseen buckets — the
    // deterministic winner is the ascending-label min among ties only if
    // scores tie; here just pin that a single-script doc predicts stably
    val again = TextAnalysis.langProfilePredict(corpus, model, buckets = b)
      .select($"doc_id", $"lang_pred").as[(Long, String)].collect().toMap
    assert(again == pred)
  }

  test("scriptMix: counts, dominant non-Latin script, mixed flag") {
    val docs = Seq(
      (1L, "plain latin only"),
      (2L, "latin with \u0442\u0435\u043a\u0441\u0442 inside"),      // + 5 Cyrillic
      (3L, "\u4e2d\u6587 and \u03b1\u03b2\u03b3\u03b4 mixed"),       // 2 Han + 4 Greek + latin
      (4L, "12345 .,;!")                                          // no letters at all
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptMix(docs)
      .select($"doc_id", $"n_latin", $"n_cyrillic", $"n_greek", $"n_han",
        $"n_arabic", $"main_other", $"mixed")
      .as[(Long, Long, Long, Long, Long, Long, String, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 14L, 0L, 0L, 0L, 0L, "none", false))
    assert(got(2L) == (2L, 15L, 5L, 0L, 0L, 0L, "cyrillic", true))
    // greek (4) beats han (2); latin + greek + han = 3 scripts -> mixed
    assert(got(3L) == (3L, 8L, 0L, 4L, 2L, 0L, "greek", true))
    assert(got(4L) == (4L, 0L, 0L, 0L, 0L, 0L, "none", false))
  }
}
