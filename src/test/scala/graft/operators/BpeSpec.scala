package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** BPE training/apply: round-by-round goldens vs a local reference
  * implementation of the Sennrich algorithm, greedy-overlap semantics,
  * deterministic tie-breaks, early exhaustion, staging parity, and the
  * train-side ≡ apply-side merge equivalence. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Local reference: word-frequency BPE with (count desc, a asc, b asc)
    * tie-break and greedy left-to-right application. */
  private def refTrain(corpus: Seq[String], merges: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= merges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
          case _ =>
        }
      }
      val cand = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      cand match {
        case Some(((a, b), n)) if n >= 2 =>
          out += ((r, a, b, n))
          vocab = vocab.map { case (syms, cnt) =>
            val nb = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                nb += (a + b); i += 2
              } else { nb += syms(i); i += 1 }
            }
            nb.toVector -> cnt
          }.groupMapReduce(_._1)(_._2)(_ + _)
        case _ => done = true
      }
      r += 1
    }
    out.toSeq
  }

  private def train(corpus: Seq[String], merges: Int,
      dir: Option[String] = None): Seq[(Int, String, String, Long)] =
    Bpe.bpeTrain(corpus.zipWithIndex.map(_.swap).toDF("id", "text"), merges,
      stagingDir = dir)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq

  test("learned rules match the reference on a hand corpus") {
    val corpus = Seq(
      "low low low low low", "lower lower", "newest newest newest",
      "widest widest", "new new new")
    assert(train(corpus, 8) == refTrain(corpus, 8))
  }

  test("greedy overlap: rule (a,a) merges leftmost-first") {
    // "aaaa" repeated: pair (a,a) counted per occurrence; after merging,
    // each word becomes [aa, aa] — reference semantics
    val corpus = Seq("aaaa aaaa aaaa")
    val got = train(corpus, 2)
    val ref = refTrain(corpus, 2)
    assert(got == ref, s"got $got want $ref")
    assert(got.head._2 == "a" && got.head._3 == "a")
  }

  test("deterministic tie-break: equal counts resolve by (lhs, rhs) ascending") {
    // "xy" and "yx" each appear twice → counts tie at 2; (x,y) < (y,x)
    val corpus = Seq("xy xy yx yx")
    val got = train(corpus, 1)
    assert(got == Seq((1, "x", "y", 2L)), got.toString)
  }

  test("early exhaustion: stops when no pair repeats") {
    val corpus = Seq("ab cd ef") // every pair occurs once
    assert(train(corpus, 5).isEmpty)
  }

  test("stagingDir path learns identical rules; random-corpus parity") {
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "aab", "abab", "bb")
    val corpus = (1 to 30).map(_ =>
      (1 to 6).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val ref = refTrain(corpus, 10)
    assert(train(corpus, 10) == ref)
    val dir = java.nio.file.Files.createTempDirectory("bpe-stg").toString
    try assert(train(corpus, 10, Some(dir)) == ref)
    finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("bpeTokens (apply side) ≡ relational train-side application, per rule") {
    val rnd = new scala.util.Random(23)
    val alphabet = "ab"
    (1 to 40).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(9)))
        .map(_ => alphabet(rnd.nextInt(2))).mkString
      val (a, b) = (alphabet(rnd.nextInt(2)).toString, alphabet(rnd.nextInt(2)).toString)
      val rel = Bpe.applyMergeRelational(
        Seq((w, 1L, w.map(_.toString))).toDF("w", "cnt", "syms"), a, b)
        .select($"syms").as[Seq[String]].head()
      val fold = Seq(w).toDF("t")
        .select(Bpe.bpeTokens($"t", Seq(a -> b)).as("r"))
        .as[Seq[String]].head()
      assert(rel == fold, s"word=$w rule=($a,$b): relational=$rel fold=$fold")
    }
  }

  test("bpeTokens applies rules in rank order") {
    // rules learned on "aab": (a,b) likely first? — pin explicitly:
    // rule1 (a,b) then rule2 (a,ab): "aab" → [a, ab] → [aab]
    val toks = Seq("aab").toDF("t")
      .select(Bpe.bpeTokens($"t", Seq("a" -> "b", "a" -> "ab")).as("r"))
      .as[Seq[String]].head()
    assert(toks == Seq("aab"), toks.toString)
  }

  test("byteBpeTrain: byte symbols are hex pairs; rules merge bytes") {
    // corpus "he he hello": bytes of 'h'=68, 'e'=65 — pair (68,65)
    // occurs 3× (every word starts "he"), must be merge #1 → "6865"
    val docs = Seq("he he hello").toDF("text")
    val rules = Bpe.byteBpeTrain(docs, merges = 2)
      .orderBy($"rank")
      .select($"lhs", $"rhs", $"pair_count").as[(String, String, Long)]
      .collect().toSeq
    assert(rules.head == (("68", "65", 3L)), rules.toString)
    // merge #2 consumes the merged symbol: ("6865","6C") from "hello"?
    // hel appears once — actual #2 is whatever repeats; just pin shape:
    // every lhs/rhs is an even-length uppercase-hex string
    rules.foreach { case (a, b, _) =>
      assert(a.length % 2 == 0 && b.length % 2 == 0)
      assert((a + b).forall(c => c.isDigit || ('A' to 'F').contains(c)))
    }
  }

  test("byte BPE: NO [UNK] on arbitrary Unicode — tokens always reassemble") {
    // adversarial inputs: emoji, CJK, combining marks, RTL, lone accents
    val words = Seq("héllo", "中文", "🚀x", "שָׁלוֹם", "á", "ĄĘŁ", "日本語テスト")
    val docs = words.map(w => s"$w $w filler text common words here")
      .mkString(" ").split("\\s+").mkString(" ")
    val rules = Bpe.byteBpeTrain(Seq(docs).toDF("text"), merges = 4)
      .orderBy($"rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val merged = rules.map { case (a, b) => a + b }.toSet
    words.foreach { w =>
      val toks = Seq(w).toDF("t")
        .select(Bpe.byteBpeTokens(lower($"t"), rules)).as[Seq[String]].head()
      // reassembly: concatenated tokens == the word's exact UTF-8 hex
      val hexW = w.toLowerCase.getBytes("UTF-8")
        .map(b => f"${b & 0xFF}%02X").mkString
      assert(toks.mkString == hexW, s"word=$w toks=$toks")
      // closure: every token is a base byte or a learned merge — the
      // no-[UNK] property (nothing else can appear by construction)
      toks.foreach { t =>
        assert(t.length == 2 || merged.contains(t), s"word=$w token=$t")
      }
    }
  }

  test("byteBpeTokens ≡ relational train-side application on byte symbols") {
    val rnd = new scala.util.Random(41)
    (1 to 20).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(6)))
        .map(_ => "ab中é"(rnd.nextInt(4))).mkString
      val syms = w.getBytes("UTF-8").map(b => f"${b & 0xFF}%02X").toSeq
      val (a, b) = (syms(rnd.nextInt(syms.length)), syms(rnd.nextInt(syms.length)))
      val rel = Bpe.applyMergeRelational(
        Seq((w, 1L, syms)).toDF("w", "cnt", "syms"), a, b)
        .select($"syms").as[Seq[String]].head()
      val fold = Seq(w).toDF("t")
        .select(Bpe.byteBpeTokens($"t", Seq(a -> b)).as("r"))
        .as[Seq[String]].head()
      assert(rel == fold, s"word=$w rule=($a,$b): relational=$rel fold=$fold")
    }
  }
}
