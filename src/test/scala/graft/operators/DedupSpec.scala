package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Ground-truth tests for the dedup family on hand-constructed corpora with
  * known duplicate structure (the fixture documents are mostly unique, so
  * recall has to be proven on synthetic near-dups).
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " * 4
  private val nearDup = base.replace("lazy", "sleepy") // one-token change
  private val unrelated =
    "completely different content about spark catalyst optimizer rules and tungsten memory format " * 3

  private def corpus = Seq(
    (0L, base, "b1"), (1L, base, "b1"),        // exact dup pair
    (2L, nearDup, "b1"),                        // near dup of 0/1
    (3L, unrelated, "b1"), (4L, unrelated + "extra tail words here", "b1")
  ).toDF("doc_id", "text", "block")

  test("exact dedup keeps deterministic survivor with dup count") {
    val got = Dedup.exact(corpus, "text", "doc_id")
      .select($"doc_id", $"n_dups").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("minhash LSH finds exact and near dups, skips unrelated") {
    val pairs = Dedup.minhashPairs(corpus, bands = 32, rowsPerBand = 2, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair must be found (jaccard 1.0)")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      "near-dup (one-token edit) must be found")
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((0L, 4L)),
      "unrelated docs must not pair with base")
  }

  test("minhash jaccard estimate is close to exact jaccard") {
    import graft.functions.TextFunctions._
    val sigs = corpus.select($"doc_id",
      minhashSig(array_distinct(hashed(shingles(tokens($"text"), 3))), 128).as("sig"))
    val a = sigs.filter($"doc_id" === 0).head().getSeq[Long](1)
    val c = sigs.filter($"doc_id" === 2).head().getSeq[Long](1)
    val est = a.zip(c).count { case (x, y) => x == y }.toDouble / 128
    val exact = Dedup.ngramJaccardPairs(corpus, blockCol = col("block"), threshold = 0.0)
      .filter($"id_a" === 0 && $"id_b" === 2).head().getDouble(2)
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
  }

  test("simhash: identical→hamming 0; near-dup closer than unrelated") {
    import graft.functions.TextFunctions._
    val sims = corpus.select($"doc_id", simhash64(hashed(tokens($"text"))).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sims(0L) == sims(1L), "identical docs → identical simhash")
    val h02 = java.lang.Long.bitCount(sims(0L) ^ sims(2L))
    val h03 = java.lang.Long.bitCount(sims(0L) ^ sims(3L))
    assert(h02 < h03, s"near-dup ($h02) must be closer than unrelated ($h03)")

    // candidate generation: 8 chunks pigeonhole-guarantee detection ≤ 7 bits
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 64, chunks = 8, maxBucket = 100)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(pairs((0L, 1L)) == 0)
    if (h02 <= 7) assert(pairs.get((0L, 2L)).contains(h02))
  }

  test("embedding near-dup pairs find the planted duplicate vector") {
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val dup = v.clone(); dup(7) = dup(7) * 1.01f     // ~same direction
    val ortho = Array.tabulate(8)(i => if (i % 2 == 0) 1f else -1f)
    val embs = Seq((0L, v.toSeq, 0), (1L, dup.toSeq, 0), (2L, ortho.toSeq, 0))
      .toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingPairs(embs, blockCol = col("label"), threshold = 0.95)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("embedding maxBlock guard: degenerate block skipped, small blocks verified") {
    val v = Array.tabulate(4)(i => (i + 1).toFloat).toSeq
    // 20 vectors in one degenerate block + a small honest block with a dup
    val embs = ((0L until 20L).map(i => (i, v, "hot")) ++
      Seq((100L, v, "ok"), (101L, v, "ok")))
      .toDF("vec_id", "embedding", "label")
    val got = Dedup.embeddingPairs(embs, blockCol = col("label"),
      threshold = 0.9, maxBlock = Some(10))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)),
      "hot block dropped by the guard, honest block still verified")
    val uncapped = Dedup.embeddingPairs(embs, blockCol = col("label"),
      threshold = 0.9, maxBlock = None).count()
    assert(uncapped == 20L * 19 / 2 + 1)
  }

  test("dedupCorpus: exact dup collapsed, near dup dropped, unrelated kept") {
    val survivors = Dedup.dedupCorpus(corpus.drop("block"), threshold = 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(survivors.contains(0L), "min-id exact survivor kept")
    assert(!survivors.contains(1L), "exact duplicate dropped")
    assert(!survivors.contains(2L), "near duplicate dropped")
    assert(survivors.contains(3L), "unrelated doc kept")
  }

  test("dedupCorpusCC: one survivor per transitive cluster; subset of one-pass") {
    // Hub topology: doc 3 is near-dup of BOTH 1 and 2, but 1 and 2 are
    // not near-dups of each other (two single-word edits in different
    // positions — 6 shingles apart, J ≈ 0.73 < 0.8; each is 3 shingles
    // from the hub, J ≈ 0.85 ≥ 0.8). One-pass keeps every local minimum
    // {1, 2}; CC collapses the transitive cluster {1, 2, 3} to {1}.
    val words = (0 until 40).map(i => s"tok$i")
    val hub = words.mkString(" ")
    val editA = words.updated(5, "edita").mkString(" ")
    val editB = words.updated(30, "editb").mkString(" ")
    val docs = Seq((1L, editA), (2L, editB), (3L, hub), (9L, unrelated))
      .toDF("doc_id", "text")
    val onePass = Dedup.dedupCorpus(docs).select($"doc_id").as[Long].collect().toSet
    val viaCC = Dedup.dedupCorpusCC(docs).select($"doc_id").as[Long].collect().toSet
    assert(onePass == Set(1L, 2L, 9L), s"one-pass keeps local minima: $onePass")
    assert(viaCC == Set(1L, 9L), s"CC keeps one per cluster: $viaCC")
    assert(viaCC.subsetOf(onePass))

    // survivorOrd flips the policy: maximize doc_id → the cluster
    // {1,2,3} keeps 3 instead of 1; the singleton is untouched
    val best = Dedup.dedupCorpusCC(docs, survivorOrd = Some($"doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    assert(best == Set(3L, 9L), s"keep-max policy: $best")
  }

  test("survivorsFromLabelsBy: per-cluster arg-max policy, ties to min id, absent docs survive") {
    // label table: cluster {1,2,3} (component 1), cluster {4,5}
    // (component 4), singleton {6}; docs 7, 8 never entered the pair graph
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("id", "component")
    val cand = Seq((1L, 10), (2L, 30), (3L, 30), (4L, 5), (5L, 5), (6L, 1),
      (7L, 0), (8L, 99)).toDF("doc_id", "score")
    val kept = Dedup.survivorsFromLabelsBy(cand, labels, col("score"))
      .select($"doc_id").as[Long].collect().toSet
    // cluster 1: max score 30 shared by {2,3} → min id 2 wins;
    // cluster 4: tie {4,5} → 4; singleton 6 survives; 7, 8 untouched
    assert(kept == Set(2L, 4L, 6L, 7L, 8L))

    // constant score degenerates to the min-id policy == survivorsFromLabels
    val minId = Dedup.survivorsFromLabels(cand, labels)
      .select($"doc_id").as[Long].collect().toSet
    val constOrd = Dedup.survivorsFromLabelsBy(cand, labels, lit(0))
      .select($"doc_id").as[Long].collect().toSet
    assert(constOrd == minId)
  }

  test("stagingDir: parquet-staged diamond gives identical outputs, staged tables on disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-staging").toString
    try {
      val pPairs = Dedup.minhashPairs(corpus, bands = 32, rowsPerBand = 2,
        threshold = 0.5).select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      val sPairs = Dedup.minhashPairs(corpus, bands = 32, rowsPerBand = 2,
        threshold = 0.5, stagingDir = Some(s"$dir/pairs"))
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(sPairs == pPairs, "staged minhashPairs must equal the persist path")
      def stagedTables(d: String, prefix: String): Array[java.io.File] = {
        val ls = new java.io.File(d).listFiles()
        if (ls == null) Array.empty
        else ls.filter(f => f.isDirectory && f.getName.startsWith(prefix))
      }
      assert(stagedTables(s"$dir/pairs", "signatures_").nonEmpty,
        "signature pass must be written as an explicit parquet table")

      val pCorpus = Dedup.dedupCorpus(corpus.drop("block"), threshold = 0.5)
        .select($"doc_id").as[Long].collect().toSet
      val sCorpus = Dedup.dedupCorpus(corpus.drop("block"), threshold = 0.5,
        stagingDir = Some(s"$dir/corpus"))
        .select($"doc_id").as[Long].collect().toSet
      assert(sCorpus == pCorpus)
      assert(stagedTables(s"$dir/corpus", "exact_survivors_").nonEmpty)

      val pCC = Dedup.dedupCorpusCC(corpus.drop("block"), threshold = 0.5)
        .select($"doc_id").as[Long].collect().toSet
      val sCC = Dedup.dedupCorpusCC(corpus.drop("block"), threshold = 0.5,
        stagingDir = Some(s"$dir/cc"))
        .select($"doc_id").as[Long].collect().toSet
      assert(sCC == pCC)
      // the pair graph here is tiny, so CC takes the driver-local fast
      // path: the staged canonical table is retired the moment the labels
      // exist as a local relation, and no round tables are ever written —
      // ALL cc scratch is gone (the iterative staged-round rotation keeps
      // its own coverage in GraphSpec, threshold pinned to 0)
      assert(stagedTables(s"$dir/cc", "cc_canon_").isEmpty,
        "fast path must retire the staged canonical set immediately")
      assert(stagedTables(s"$dir/cc", "cc_round_").isEmpty,
        "fast path never writes round tables")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("pairRecallAudit: self-audit is 1.0; minhash holds the recall floor on the fixture") {
    // self-audit: exact vs itself
    val exact = Dedup.ngramJaccardPairs(corpus, blockCol = $"block",
      threshold = 0.5, dfCap = None)
    val self = Dedup.pairRecallAudit(exact, exact)
      .select($"n_exact", $"n_hit", $"recall")
      .as[(Long, Long, Double)].head()
    assert(self._1 > 0 && self._1 == self._2 && self._3 == 1.0, s"self-audit $self")

    // empty exact side: recall defined as 1.0 (nothing to find), not null
    val empty = Dedup.pairRecallAudit(exact.filter(lit(false)), exact)
      .select($"recall").as[Double].head()
    assert(empty == 1.0)

    // the real audit on the fixture corpus: the banding miss probability at
    // J >= 0.5 with bands=32 r=2 is ~1e-4, so recall must stay at the floor
    val audit = Dedup.pairRecallAudit(
      Dedup.ngramJaccardPairs(graft.Tables.documents(spark, sf0001),
        blockCol = $"lang", threshold = 0.5, dfCap = None),
      Dedup.minhashPairs(graft.Tables.documents(spark, sf0001),
        bands = 32, rowsPerBand = 2, threshold = 0.5))
      .select($"n_exact", $"n_hit", $"recall")
      .as[(Long, Long, Double)].head()
    assert(audit._1 > 0, "fixture must contain qualifying pairs")
    assert(audit._3 >= 0.9, s"minhash recall under the floor: $audit")
  }

  test("ngram dfCap: planted boilerplate shingle is pruned, honest pairs survive") {
    // every doc shares one boilerplate sentence; two docs are real near-dups
    val boiler = "click here to subscribe to our newsletter today "
    val docs = ((0L until 20L).map(i =>
      (i, boiler + s"unique content number $i with extra words ${i * 7}", "b")) ++
      Seq((100L, boiler + base, "b"), (101L, boiler + nearDup, "b")))
      .toDF("doc_id", "text", "block")
    // cap = 5 kills the df=22 boilerplate shingles. Capping lowers measured
    // J for everyone (intersection loses the capped shingles, union keeps
    // full lens): the honest near-dup pair drops from ~0.75 to ~0.4 — still
    // well over 0.3 — while boilerplate-only pairs drop to ~0.
    val got = Dedup.ngramJaccardPairs(docs, blockCol = col("block"),
      threshold = 0.3, dfCap = Some(5))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((100L, 101L)), "near-dup pair must survive the cap")
    // pairs glued ONLY by boilerplate never reach the threshold
    assert(!got.exists { case (a, b) => a < 20L && b < 20L })
    // sanity: uncapped, the honest pair is found at the strict threshold too
    val uncapped = Dedup.ngramJaccardPairs(docs, blockCol = col("block"),
      threshold = 0.5, dfCap = None)
      .filter($"id_a" === 100L && $"id_b" === 101L).count()
    assert(uncapped == 1)
  }

  test("skew guard: oversized buckets are dropped, not exploded") {
    val many = (0L until 200L).map(i => (i, base, "b")).toDF("doc_id", "text", "block")
    // 200 identical docs → every bucket has 200 members > maxBucket=50 → no pairs
    val n = Dedup.minhashPairs(many, bands = 4, rowsPerBand = 2, maxBucket = 50).count()
    assert(n == 0)
  }

  test("dupCoverage: hand-computed span union, clamping, and short docs") {
    // k=3 over known token layouts:
    //  doc 0: "a b c d e f"      — trigram "a b c" repeated in doc 1
    //  doc 1: "a b c x y z"      — shares only that one trigram
    //  doc 2: "p q r s t u"      — fully unique → coverage 0
    //  doc 3/4: "w w"            — short-doc whole-text shingle, duplicated
    //  doc 5: "m m m m m"        — self-repetition: "m m m" at pos 0,1,2
    val d = Seq(
      (0L, "a b c d e f"), (1L, "a b c x y z"), (2L, "p q r s t u"),
      (3L, "w w"), (4L, "w w"), (5L, "m m m m m")
    ).toDF("doc_id", "text")
    val got = Dedup.dupCoverage(d, k = 3)
      .select($"doc_id", $"n_tokens", $"n_dup_tokens", $"dup_ratio")
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(0L) == ((6, 3L, 0.5)), "one dup trigram covers tokens 0-2")
    assert(got(1L) == ((6, 3L, 0.5)))
    assert(got(2L) == ((6, 0L, 0.0)), "unique doc untouched")
    assert(got(3L) == ((2, 2L, 1.0)), "short-doc shingle dup → fully covered")
    assert(got(4L) == ((2, 2L, 1.0)))
    // "m m m m m": positions 0,1,2 of the SAME trigram (count 3 ≥ 2);
    // interval union [0,3)∪[1,4)∪[2,5) = all 5 tokens
    assert(got(5L) == ((5, 5L, 1.0)), "within-doc repetition fully covered")
  }

  test("dupCoverage: overlap truncation and gap both counted correctly") {
    // doc 0 repeats "a b c" at pos 0 and pos 4 (gap at token 3): union is
    // [0,3)∪[4,7) = 6 of 7 tokens; doc 1 supplies the second occurrence
    val d = Seq(
      (0L, "a b c z a b c"), (1L, "a b c tail one two")
    ).toDF("doc_id", "text")
    val got = Dedup.dupCoverage(d, k = 3)
      .select($"doc_id", $"n_dup_tokens").as[(Long, Long)].collect().toMap
    assert(got(0L) == 6L, "two disjoint spans with a gap")
    assert(got(1L) == 3L)
  }

  test("incrementalExact: corpus-known keys dropped, batch-internal dups collapsed") {
    val standing = Seq((0L, "seen before"), (1L, "also seen")).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "seen before"),                     // known to the corpus → dropped
      (11L, "brand new"), (12L, "brand new"),   // batch-internal dup → one survivor
      (13L, "also new")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(delta, Dedup.hashIndex(standing))
      .select($"doc_id", $"n_dups").as[(Long, Long)].collect().toSet
    assert(got == Set((11L, 2L), (13L, 1L)))
    // closing the loop: union survivors' hashes into the index → re-running
    // the SAME batch yields nothing (idempotent ingestion)
    val nextIndex = Dedup.hashIndex(standing)
      .union(Dedup.incrementalExact(delta, Dedup.hashIndex(standing))
        .select($"key_hash")).distinct()
    assert(Dedup.incrementalExact(delta, nextIndex).count() == 0)
  }

  test("incrementalMinhash == batch minhashPairs restricted to delta-touching pairs") {
    val docs = graft.Tables.documents(spark, sf0001)
    val isDelta = (id: Long) => id % 10 >= 7
    val full = Dedup.minhashPairs(docs, bands = 32, rowsPerBand = 2,
      threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect()
      .filter(p => isDelta(p._1) || isDelta(p._2))
      // normalize orientation: incremental puts the delta id first
      .map { case (a, b, j) =>
        (math.min(a, b), math.max(a, b), j)
      }.toSet
    val inc = Dedup.incrementalMinhash(
      docs.filter($"doc_id" % 10 >= 7),
      Dedup.signatureIndex(docs.filter($"doc_id" % 10 < 7)),
      bands = 32, rowsPerBand = 2, threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect()
      .map { case (a, b, j) => (math.min(a, b), math.max(a, b), j) }.toSet
    assert(inc == full,
      s"incremental drifted from batch: only-inc=${(inc -- full).take(3)} " +
        s"only-batch=${(full -- inc).take(3)}")
    assert(inc.nonEmpty, "fixture should contain delta-touching near-dups")
  }

  test("precomputed sig under a different parameterization fails loudly, not with 0 recall") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy hound"))
      .toDF("doc_id", "text")
    // index signed at 16×4 = 64 hashes, consumed claiming 8×2 = 16: the
    // band slicer would silently hash wrong slices — the guard must raise
    // (NOTE 32×2 would NOT trip it: also 64 hashes — the guard is a
    // length check, the cheapest loud failure for the common mismatch)
    val idx64 = Dedup.signatureIndex(docs, bands = 16, rowsPerBand = 4)
    val err = intercept[Exception] {
      Dedup.minhashPairsFromShingles(idx64, bands = 8, rowsPerBand = 2,
        threshold = 0.1).count()
    }
    assert(err.getMessage.contains("bands*rowsPerBand") ||
      Option(err.getCause).exists(_.getMessage.contains("bands*rowsPerBand")),
      s"guard must name the contract: ${err.getMessage}")
    val err2 = intercept[Exception] {
      Dedup.incrementalMinhash(docs, idx64, bands = 8, rowsPerBand = 2,
        threshold = 0.1).count()
    }
    assert(err2.getMessage.contains("bands*rowsPerBand") ||
      Option(err2.getCause).exists(_.getMessage.contains("bands*rowsPerBand")))
    // matching parameterization still flows through the fast path
    assert(Dedup.minhashPairsFromShingles(idx64, bands = 16, rowsPerBand = 4,
      threshold = 0.1).count() >= 1)
  }

  test("dedupCorpusCCInc == batch dedupCorpusCC over the unioned corpus") {
    // standing state over the base partition (ids < delta ids, the
    // min-id survivor contract), then fold the delta batch in
    val docs = graft.Tables.documents(spark, sf0001)
    val baseDocs = docs.filter($"doc_id" % 10 < 7)
    val deltaDocs = docs.filter($"doc_id" % 10 >= 7)
      .withColumn("doc_id", $"doc_id" + 1000000L) // strictly above base ids
    val full = baseDocs.union(deltaDocs)
    val (bands, rows, thr) = (32, 2, 0.5)

    val baseSurvivors = baseDocs.join(
      Dedup.exact(baseDocs, "text", "doc_id").select($"doc_id"),
      Seq("doc_id"), "left_semi")
    val prevLabels = Graph.connectedComponents(Dedup.minhashPairs(
      baseSurvivors, bands = bands, rowsPerBand = rows, threshold = thr))
    val updated = Dedup.dedupCorpusCCInc(deltaDocs,
      Dedup.hashIndex(baseDocs), Dedup.signatureIndex(baseSurvivors),
      prevLabels, bands = bands, rowsPerBand = rows, threshold = thr)
      .as[(Long, Long)].collect().toMap

    // the incremental label table must equal a full CC recompute over
    // the union corpus's pair graph, label values included
    val fullSurvivors = full.join(
      Dedup.exact(full, "text", "doc_id").select($"doc_id"),
      Seq("doc_id"), "left_semi")
    val batchLabels = Graph.connectedComponents(Dedup.minhashPairs(
      fullSurvivors, bands = bands, rowsPerBand = rows, threshold = thr))
      .as[(Long, Long)].collect().toMap
    assert(updated == batchLabels,
      s"only-inc=${(updated.toSet -- batchLabels.toSet).take(3)} " +
        s"only-batch=${(batchLabels.toSet -- updated.toSet).take(3)}")
    assert(updated.exists { case (id, c) => id != c },
      "fixture should merge at least one cluster")

    // handing pre-computed exact survivors in via deltaUniq (the
    // exact-dedup-already-ran pipeline shape) must change nothing
    val preUniq = deltaDocs.join(
      Dedup.incrementalExact(deltaDocs, Dedup.hashIndex(baseDocs))
        .select($"doc_id"),
      Seq("doc_id"), "left_semi")
    val viaParam = Dedup.dedupCorpusCCInc(deltaDocs,
      Dedup.hashIndex(baseDocs), Dedup.signatureIndex(baseSurvivors),
      prevLabels, bands = bands, rowsPerBand = rows, threshold = thr,
      deltaUniq = Some(preUniq))
      .as[(Long, Long)].collect().toMap
    assert(viaParam == updated)

    // and the derived survivor set must match the batch operator exactly
    val incSurvivors = fullSurvivors.join(
      updated.toSeq.toDF("doc_id", "component")
        .filter($"doc_id" =!= $"component").select($"doc_id"),
      Seq("doc_id"), "left_anti")
      .select($"doc_id").as[Long].collect().toSet
    val batchSurvivors = Dedup.dedupCorpusCC(full, bands = bands,
      rowsPerBand = rows, threshold = thr)
      .select($"doc_id").as[Long].collect().toSet
    assert(incSurvivors == batchSurvivors)
  }

  test("semanticPairs: exact-verified subset of ground truth, recall floor, dial") {
    val embs = graft.Tables.embeddings(spark, sf0001)
    val truth = Dedup.embeddingPairs(embs, blockCol = lit(1),
      threshold = 0.35, maxBlock = None)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val got = Dedup.semanticPairs(embs, threshold = 0.35, nlist = 8, nprobe = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth), "every returned pair must be exact-verified")
    assert(truth.nonEmpty && got.nonEmpty)
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.5, s"blocked recall collapsed: $recall")
    // multi-probe is the recall dial: probing every cell = ground truth
    val all = Dedup.semanticPairs(embs, threshold = 0.35, nlist = 8, nprobe = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(all == truth, "nprobe = nlist must recover the full pair set")
    assert(all.size >= got.size)
  }

  test("incrementalMinhashFromPostings == generic incrementalMinhash (incl. guard)") {
    // base corpus with a planted near-dup target and a hot boilerplate
    // bucket the maxBucket guard must prune identically on both paths
    val boiler = "shared boilerplate sentence repeated across the corpus " * 3
    val baseDocs = (0L until 30L).map { i =>
      if (i % 3 == 0) (i, boiler) // hot bucket fodder
      else (i, s"unique base document number $i with distinct content tail $i")
    }.toDF("doc_id", "text")
    val delta = Seq(
      (100L, boiler),                                                  // joins the hot bucket
      (101L, "unique base document number 4 with distinct content tail 4"), // exact text of base 4
      (102L, "unique base document number 7 with distinct content tails 7"), // near-dup of base 7
      (103L, "entirely novel delta content that matches nothing else here"),
      (104L, "entirely novel delta content that matches nothing else there") // near-dup of 103
    ).toDF("doc_id", "text")
    val (b, r, thr, cap) = (16, 4, 0.5, 8)
    val sigIdx = Dedup.signatureIndex(baseDocs, bands = b, rowsPerBand = r)
      .persist()
    val posts = Dedup.bandPostings(sigIdx, bands = b, rowsPerBand = r)
    val cnts = Dedup.bandBucketCounts(posts)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b", round($"jaccard", 9))
        .as[(Long, Long, Double)].collect().toSet
    val generic = pairSet(Dedup.incrementalMinhash(delta, sigIdx,
      bands = b, rowsPerBand = r, threshold = thr, maxBucket = cap))
    val posted = pairSet(Dedup.incrementalMinhashFromPostings(delta, sigIdx,
      posts, cnts, bands = b, rowsPerBand = r, threshold = thr, maxBucket = cap))
    assert(posted == generic, s"posted $posted != generic $generic")
    assert(generic.nonEmpty, "fixture must actually produce pairs")
    // the guard really engaged: without it the hot boilerplate bucket
    // would pair the delta boiler doc with every base boiler doc
    val unguarded = pairSet(Dedup.incrementalMinhash(delta, sigIdx,
      bands = b, rowsPerBand = r, threshold = thr, maxBucket = 1000))
    assert(unguarded.exists(_._1 == 100L) && !generic.exists(_._1 == 100L),
      "maxBucket guard must prune the planted hot bucket on both paths")
    sigIdx.unpersist()
    ()
  }

  test("dedupSubstrings: first occurrence survives, spans excised, overlaps merged") {
    val docs = Seq(
      (0L, "a1 a2 c1 c2 c3 a3 a4 a5"), // holds the first "c1 c2 c3"
      (1L, "B1 b2 C1 c2 c3 b3 b4 b5"), // repeats it (case-folded) at pos 2
      (2L, "p1 p2 p3 p4 p5 p6"),       // first occurrence of the long run
      (3L, "m1 p1 p2 p3 p4 p5 p6 n1"), // 4 overlapping dup shingles → one merged span
      (4L, "k1 k2 k3 j1 j2 k1 k2 k3"), // within-doc repeat: later occurrence excised
      (5L, "s1 s2"), (6L, "s1 s2"),    // short (< k) exact dup: whole-doc shingle
      (7L, "u1 u2 u3 u4")              // no duplicated shingle anywhere
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSubstrings(docs, k = 3)
      .select($"doc_id", $"text_dedup", $"n_tokens", $"n_removed")
      .as[(Long, String, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(0L) == (("a1 a2 c1 c2 c3 a3 a4 a5", 8, 0L)),
      "first corpus occurrence must survive untouched")
    assert(got(1L) == (("b1 b2 b3 b4 b5", 8, 3L)),
      "later occurrence loses exactly the repeated span (lowercased contract)")
    assert(got(2L) == (("p1 p2 p3 p4 p5 p6", 6, 0L)))
    // doc 3's dup shingles cover positions 1..4, spans [1,4)..[4,7):
    // merged to ONE [1,7) island — 6 tokens, not 4 × k = 12
    assert(got(3L) == (("m1 n1", 8, 6L)),
      "overlapping excision spans must merge before counting")
    assert(got(4L) == (("k1 k2 k3 j1 j2", 8, 3L)),
      "within-doc repeat: first occurrence kept, second excised")
    assert(got(5L) == (("s1 s2", 2, 0L)))
    assert(got(6L) == (("", 2, 2L)),
      "short-doc whole-doc shingle: later copy excised entirely")
    assert(got(7L) == (("u1 u2 u3 u4", 4, 0L)))
  }

  test("dedupSubstrings stagingDir: same output, nothing pinned after the call") {
    val docs = Seq(
      (0L, "a1 a2 c1 c2 c3 a3 a4 a5"),
      (1L, "B1 b2 C1 c2 c3 b3 b4 b5"),
      (2L, "m1 p1 p2 p3 p4 p5 p6 n1"),
      (3L, "p1 p2 p3 p4 p5 p6")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"text_dedup", $"n_tokens", $"n_removed")
      .as[(Long, String, Int, Long)].collect().toSet
    val default = rows(Dedup.dedupSubstrings(docs, k = 3))
    spark.catalog.clearCache() // release the default path's staging persist
    val dir = java.nio.file.Files.createTempDirectory("substr_stage").toString
    val before = spark.sparkContext.getPersistentRDDs.size
    val staged = rows(Dedup.dedupSubstrings(docs, k = 3,
      stagingDir = Some(dir)))
    // durable staging pins nothing in the CacheManager (the r16 advisory:
    // the persist-path default has no release point because the lazy
    // result closes over the diamond — stagingDir is the leak-free path)
    // <= not ==: clearCache unpersists asynchronously, so `before` may
    // still count pins that drain while the staged run executes — the
    // staged path itself adding a pin is what must fail
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "stagingDir path must not pin CacheManager relations")
    assert(staged == default, "staged and persisted paths must agree")
    graft.operators.Staging.drop(spark, dir)
  }

  test("snapshotDiff: all four statuses; content compared, not row identity") {
    val oldSnap = Seq((1L, "same"), (2L, "will change"), (3L, "goes away"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(oldSnap, newSnap)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), s"got $got")
  }

  test("mirrorHosts: mirrors found, boilerplate capped, thresholds bind") {
    // m1/m2 mirror 3 of each other's 4 contents; solo shares only the
    // corpus-wide boilerplate line, which every host carries and the
    // dfCap must remove before pair mining (else all pairs inflate)
    val docs = (
      Seq("a", "b", "c", "d").map(("m1", _)) ++
        Seq("a", "b", "c", "e").map(("m2", _)) ++
        Seq("x", "y", "z", "w").map(("solo", _)) ++
        Seq("m1", "m2", "solo").map((_, "boiler")) ++
        Seq(("m1", "a")) // duplicate rows collapse before counting
      ).toDF("host", "content")
    val got = Dedup.mirrorHosts(docs, col("host"), col("content"),
      dfCap = 2)
      .select($"host_a", $"host_b", $"n_shared", $"n_a", $"n_b",
        $"overlap_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("m1", "m2", 3L, 4L, 4L, 750000L)), s"got $got")
    // raising minShared above the overlap empties the result
    assert(Dedup.mirrorHosts(docs, col("host"), col("content"),
      minShared = 4, dfCap = 2).isEmpty)
    // without the cap the boilerplate line certifies solo's pairs too
    val uncapped = Dedup.mirrorHosts(docs, col("host"), col("content"),
      minShared = 1, minOverlapPpm = 0L, dfCap = 64)
      .select($"host_a", $"host_b").as[(String, String)].collect().toSet
    assert(uncapped == Set(("m1", "m2"), ("m1", "solo"), ("m2", "solo")))
  }
}
