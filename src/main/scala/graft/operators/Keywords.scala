package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-pattern SUBSTRING scanning at blocklist scale — the
  * Aho–Corasick automaton (Aho & Corasick, "Efficient string matching:
  * an aid to bibliographic search", CACM 1975), the standard answer
  * when a pretraining pre-filter carries thousands of bad-word /
  * spam-phrase patterns and a regex alternation (`p1|p2|…|pN`) stops
  * being viable: AC matches ALL patterns in ONE linear pass per
  * document, O(text + hits), independent of pattern count.
  *
  * This is a different primitive from the token-set checks in
  * [[TextAnalysis]] (stopword ratios, `array_contains` filters): AC
  * matches SUBSTRINGS — across word boundaries, nested patterns
  * ("tab" inside "table"), overlapping occurrences ("a a" twice in
  * "a a a") — with the textbook semantics: one hit per pattern per END
  * POSITION, so nested and overlapping occurrences all count.
  *
  * Scale shape: the automaton is built ONCE driver-side from the
  * pattern list (bounded by contract — a blocklist is 10³–10⁵ short
  * strings; build is linear in total pattern length) and BROADCAST;
  * the scan is a batched `mapPartitions` over the text column — zero
  * shuffles, and [[matchCounts]] emits the SPARSE (doc, pattern, n)
  * relation (only patterns that hit), so downstream traffic is
  * hits-sized, not |docs|×|patterns|.
  */
object Keywords {

  /** Immutable, serializable Aho–Corasick automaton. States are dense
    * ints; goto is the SPARSE trie edge map per state plus the fail
    * array — the scan walks fail chains on a miss (amortized O(1) per
    * char: the chain only descends depth the matched prefix built up),
    * so memory stays O(total pattern length). Closing every state's
    * map over its fail chain would pre-resolve misses but embeds (at
    * least) the root's whole edge set into EVERY state — at the
    * 10⁴–10⁵-pattern blocklist scale that is a multi-GB serialized
    * object for a constant-factor scan win. Output lists carry PATTERN
    * INDICES, pre-merged through the fail links at build time so only
    * the TRANSITION walks chains, never the emit. */
  final class Automaton private[Keywords] (
      val patterns: IndexedSeq[String],
      trie: Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[Array[Int]]) extends Serializable {

    /** One transition: deepest fail-ancestor with a c-edge, else root. */
    private def step(state: Int, c: Char): Int = {
      var s = state
      while (s != 0 && !trie(s).contains(c)) s = fail(s)
      trie(s).getOrElse(c, 0)
    }

    /** Count all occurrences of every pattern in `text` (textbook AC
      * semantics: every end position counts). Returns a dense count
      * array indexed like `patterns`. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var state = 0
      var i = 0
      while (i < text.length) {
        state = step(state, text.charAt(i))
        val hits = out(state)
        var j = 0
        while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
        i += 1
      }
      counts
    }

    /** True iff ANY pattern occurs (early-exit scan — the blocklist
      * drop predicate). */
    def containsAny(text: String): Boolean = {
      var state = 0
      var i = 0
      while (i < text.length) {
        state = step(state, text.charAt(i))
        if (out(state).nonEmpty) return true
        i += 1
      }
      false
    }

    // UTF8String entry points for the codegen'd expressions (generated
    // Java passes the raw column value; the String hop happens here)

    def containsAnyUtf8(text: org.apache.spark.unsafe.types.UTF8String): Boolean =
      containsAny(text.toString)

    /** Sparse hit rows for [[AhoMatchCounts]]:
      * `array<struct<idx:int, n:bigint>>` over patterns with n ≥ 1. */
    def countsArrayData(text: org.apache.spark.unsafe.types.UTF8String)
        : org.apache.spark.sql.catalyst.util.ArrayData = {
      val counts = countAll(text.toString)
      val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
      var i = 0
      while (i < counts.length) {
        if (counts(i) > 0L)
          rows += org.apache.spark.sql.catalyst.InternalRow(i, counts(i))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray)
    }
  }

  /** Build the automaton: trie → BFS fail links → outputs merged
    * through fail. Driver-side; linear in total pattern length, and so
    * is the built object (sparse edges only — see the Automaton
    * scaladoc for why the maps are NOT closed over fail). */
  def buildAutomaton(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "empty pattern list")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    val pats = patterns.toIndexedSeq
    val trie = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    pats.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        node = trie(node).getOrElseUpdate(c, {
          trie += scala.collection.mutable.Map.empty[Char, Int]
          outB += scala.collection.mutable.ArrayBuffer.empty[Int]
          trie.length - 1
        })
      }
      outB(node) += pi
    }
    val n = trie.length
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    trie(0).valuesIterator.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      trie(u).foreach { case (c, v) =>
        // walk u's fail chain for the deepest state with a c-edge
        var f = fail(u)
        while (f != 0 && !trie(f).contains(c)) f = fail(f)
        fail(v) = if (trie(f).contains(c) && trie(f)(c) != v) trie(f)(c) else 0
        outB(v) ++= outB(fail(v)) // merge outputs through fail
        queue += v
      }
    }
    new Automaton(pats, trie.map(_.toMap).toArray, fail,
      outB.map(_.toArray.sorted).toArray)
  }

  /** Case/normalization fold — the dial every production blocklist
    * runs on ("VIAGRA", decomposed "Ⅴiagra" lookalikes must hit the
    * same pattern): NFC canonical composition first (so composed and
    * decomposed spellings of the same glyph agree), then a
    * locale-independent lowercase (`Locale.ROOT`). The column side
    * deliberately does NOT use Spark's `lower`: on any string carrying
    * a non-ASCII char, built-in `lower` falls back to the JVM DEFAULT
    * locale (`UTF8String.toLowerCaseSlow`), so under a tr/az locale
    * 'I' folds to dotless 'ı' and silently stops matching the
    * ROOT-folded patterns — both sides fold through ROOT instead. */
  private[operators] def foldPattern(p: String): String =
    java.text.Normalizer.normalize(p, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)

  /** The matching column fold: same order as [[foldPattern]] — the NFC
    * kernel expression, then the ROOT-lowercase kernel (both codegen'd,
    * both locale-pinned). */
  private def foldColumn(c: Column): Column =
    graft.functions.TextFunctions.rootLower(
      graft.functions.TextFunctions.nfcNormalize(c))

  /** Fold + DEDUPE a pattern list: distinct folded forms, each carrying
    * the FIRST original spelling that folded to it — so two caller
    * patterns that collide after folding ("Café", "CAFÉ") become
    * ONE automaton output reporting the combined count once, under the
    * first spelling, instead of one full-count row per original. */
  private def foldDistinct(patterns: Seq[String]): (Seq[String], Seq[String]) = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    patterns.foreach { p =>
      val f = foldPattern(p)
      if (!seen.contains(f)) seen(f) = p
    }
    (seen.keys.toSeq, seen.values.toSeq)
  }

  /** The SPARSE hit relation: one row per (id, pattern) with its
    * occurrence count (n ≥ 1 only — misses emit nothing). The scan is
    * a codegen'd Catalyst expression ([[AhoMatchCounts]] — the
    * automaton rides the generated code as a reference object), so the
    * whole attach→scan→explode pipeline stays inside one
    * WholeStageCodegen span; pattern indices resolve to strings via a
    * literal array, declaratively.
    *
    * `caseFold = true` turns on the case-insensitive, NFC-normalized
    * dial: patterns are folded ONCE at automaton-build time
    * ([[foldPattern]]) and the text column is composed through the
    * ROOT-lowercase + NFC kernels ahead of the scan — both stay
    * codegen'd. Patterns that collide after folding are DEDUPED at
    * build time ([[foldDistinct]]): the combined occurrence count is
    * reported exactly once, under the first colliding spelling — never
    * one full-count row per original (which would double-count any
    * sum over the relation). */
  def matchCounts(df: DataFrame, patterns: Seq[String],
      textCol: String = "text", idCol: String = "doc_id",
      caseFold: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val (pats, display) =
      if (caseFold) foldDistinct(patterns) else (patterns, patterns)
    val ac = buildAutomaton(pats)
    val patArr = array(display.map(lit): _*)
    val in = if (caseFold) foldColumn(col(textCol)) else col(textCol)
    val hits = Bridge.column(AhoMatchCounts(Bridge.expression(in), ac))
    df.select(col(idCol), explode(hits).as("h"))
      .select(col(idCol),
        element_at(patArr, col("h.idx") + 1).as("pattern"),
        col("h.n").as("n"))
  }

  /** Blocklist drop: rows whose text contains NO pattern — the
    * early-exit [[AhoContainsAny]] predicate as a plain codegen'd
    * filter (no explode, no join, no UDF, no object-serialization
    * boundary; null text passes — nothing to match). `caseFold` as in
    * [[matchCounts]]. */
  def filterNone(df: DataFrame, patterns: Seq[String],
      textCol: String = "text", caseFold: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val pats = if (caseFold) foldDistinct(patterns)._1 else patterns
    val ac = buildAutomaton(pats)
    val in = if (caseFold) foldColumn(col(textCol)) else col(textCol)
    val hit = Bridge.column(AhoContainsAny(Bridge.expression(in), ac))
    df.filter(col(textCol).isNull || !hit)
  }
}

/** Codegen'd any-pattern predicate (the `BloomContainsLong` shape): the
  * automaton rides the generated code as a reference object, so the
  * blocklist filter stays inside WholeStageCodegen over the scan — no
  * UDF, no object-serialization boundary. */
case class AhoContainsAny(child: Expression, ac: Keywords.Automaton)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "aho_contains_any"

  override def nullSafeEval(input: Any): Any =
    ac.containsAnyUtf8(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", ac,
      classOf[Keywords.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.containsAnyUtf8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoContainsAny =
    copy(child = newChild)
}

/** Codegen'd sparse hit counts: `array<struct<idx:int, n:bigint>>` over
  * patterns with n ≥ 1 (textbook AC semantics — every end position
  * counts). Null text → null (explode then emits nothing — the sparse
  * contract). */
case class AhoMatchCounts(child: Expression, ac: Keywords.Automaton)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "aho_match_counts"

  override def nullSafeEval(input: Any): Any =
    ac.countsArrayData(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", ac,
      classOf[Keywords.Automaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countsArrayData($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoMatchCounts =
    copy(child = newChild)
}
