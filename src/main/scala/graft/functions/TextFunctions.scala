package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Text-pipeline primitives for the LLM-data extensions (SURVEY.md §2.10).
  *
  * Design split:
  *  - string-level work (tokenize, shingle, per-string hashing) uses built-in
  *    codegen'd functions — each string is hashed ONCE with `xxhash64`;
  *  - the H-way minhash family and the 64-bit simhash fold are custom
  *    Catalyst expressions over the precomputed `ARRAY<LONG>` hashes: the
  *    built-in-only formulation (`transform(sequence(0,H-1), i ->
  *    array_min(transform(shingles, s -> xxhash64(s, i))))`) re-hashes every
  *    string H times — at 100 TB that's H× the string-hashing cost, which
  *    dominates. The expressions apply H cheap 64-bit mixes per
  *    already-hashed shingle instead, in one pass, with full codegen.
  */
object TextFunctions {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word n-gram shingles (strings), e.g. k=3 → "a b c" windows. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** 64-bit hash per array element (each string hashed exactly once). */
  def hashed(arr: Column): Column = transform(arr, s => xxhash64(s))

  /** MinHash signature (length `numHashes`) over pre-hashed shingles. */
  def minhashSig(shingleHashes: Column, numHashes: Int, seed: Long = 42L): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingleHashes), numHashes, seed))

  /** 64-bit SimHash over pre-hashed tokens. */
  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokenHashes)))

  /** Exact Jaccard similarity of two array columns (distinct-element). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0d, lit(0.0d)).otherwise(inter / union)
  }

  // ---- pure-Scala kernels (shared by eval and generated code) ------------

  /** splitmix64 finalizer — the standard public-domain 64-bit mixer. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D4028DB77F5939L
    z ^ (z >>> 31)
  }

  def minhashKernel(hashes: ArrayData, numHashes: Int, seed: Long): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val s = mix64(seed + i)
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = mix64(hashes.getLong(j) ^ s)
        if (h < best) best = h
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  def simhashKernel(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** `minhash_sig(shingle_hashes)` → ARRAY<LONG> of length `numHashes`.
  * One pass over the input; h_i(x) = splitmix64(x ⊕ splitmix64(seed+i)). */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    TextFunctions.minhashKernel(input.asInstanceOf[ArrayData], numHashes, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFunctions.minhashKernel($c, $numHashes, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `simhash64(token_hashes)` → LONG: sign-aggregated bit fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextFunctions.simhashKernel(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFunctions.simhashKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
