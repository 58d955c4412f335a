package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.TopKByOrd

/** Optimizer rule: rewrite the ubiquitous window top-k idiom
  *
  * {{{ df.withColumn("rk", row_number().over(
  *       Window.partitionBy(g...).orderBy(ord.desc, tie)))
  *     .filter($"rk" <= k) }}}
  *
  * into the k-bounded [[graft.functions.TopKByOrd]] aggregate + posexplode.
  * The window form shuffles EVERY row of every group into one task and
  * sorts it to keep k (Spark's own `InferWindowGroupLimit` bounds the row
  * count for rank filters but still plans the per-group sort machinery);
  * the aggregate ships ≤ k entries per (partition, group) and sorts
  * nothing — measured 10× on the corpus n-gram query this repo migrated by
  * hand (`q_ngram_topk`, 4.1 s → 0.4 s at sf0.1). This rule performs that
  * migration automatically for any user query in the supported shape.
  *
  * The rewrite fires ONLY when it is provably semantics-preserving:
  *  - exactly one window expression, `row_number()` with the default
  *    (UNBOUNDED PRECEDING, CURRENT ROW) row frame;
  *  - a conjunct of the filter bounds it: `rk <= k`, `rk < k`, `rk = 1`
  *    (integer literal, k ≥ 1);
  *  - ORDER BY is `ord DESC, tie ASC` where `ord` is a numeric whose
  *    double cast is exact (float/double/int and narrower — NOT
  *    long/decimal, whose high magnitudes collide in double), and `tie`
  *    is an integral or string (the aggregate's tie contract; nullable
  *    strings are skipped).
  *
  * Null ordering is emulated exactly by sentinel substitution: a null
  * `ord` under NULLS LAST becomes -Infinity (NULLS FIRST: +Infinity), a
  * null integral `tie` becomes Long.MinValue/MaxValue — the one
  * observable deviation is data that actually CONTAINS those sentinel
  * values, which then sorts equal to (instead of strictly before/after)
  * the null rows; `row_number` among such exact ties is arbitrary
  * anyway.
  *
  * Output attribute ids are preserved (payload struct fields and the rank
  * column re-aliased to their original exprIds), so parent operators are
  * untouched. Enabled by default when the rule is installed; opt out with
  * `spark.graft.rewriteWindowTopK=false`.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] with PredicateHelper {

  private val enabledKey = "spark.graft.rewriteWindowTopK"

  /** Double cast is order-exact for these (≤ 32-bit integrals + floats). */
  private def ordSafe(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** The aggregate's tie contract: integral (cast long) or string. */
  private def tieSafe(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  /** Extract k from a rank-bounding conjunct. */
  private def boundOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k == 1 => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(enabledKey, "true") != "true") return plan
    plan.transformUp {
      case f @ Filter(cond, Window(
          Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(
              RowFrame, UnboundedPreceding, CurrentRow))), _)),
          partSpec, orderSpec, child, _)) =>
        val rn = alias.toAttribute
        val conjuncts = splitConjunctivePredicates(cond)
        val bound: Option[(Expression, Int)] =
          conjuncts.iterator.map(c => c -> boundOf(c, rn))
            .collectFirst { case (c, Some(k)) => (c, k) }
        (bound, orderSpec) match {
          case (Some((boundConjunct, k)),
              Seq(SortOrder(ord, Descending, ordNulls, _),
                SortOrder(tie, Ascending, tieNulls, _)))
              if k >= 1 && ordSafe(ord.dataType) &&
                tieSafe(tie.dataType) &&
                !(tie.nullable && tie.dataType == StringType) =>
            val ordSafeExpr =
              if (!ord.nullable) ord
              else Coalesce(Seq(Cast(ord, DoubleType), Literal(
                if (ordNulls == NullsFirst) Double.PositiveInfinity
                else Double.NegativeInfinity, DoubleType)))
            val tieSafeExpr =
              if (!tie.nullable || tie.dataType == StringType) tie
              else Coalesce(Seq(Cast(tie, LongType), Literal(
                if (tieNulls == NullsFirst) Long.MinValue else Long.MaxValue,
                LongType)))
            val rest = conjuncts.filterNot(_ eq boundConjunct)
            rewrite(child, partSpec, ordSafeExpr, tieSafeExpr, k, rn, rest)
          case _ => f
        }
    }
  }

  private def rewrite(child0: LogicalPlan, partSpec: Seq[Expression],
      ord: Expression, tie: Expression, k: Int, rn: Attribute,
      restPredicates: Seq[Expression]): LogicalPlan = {
    // InferWindowGroupLimit may already have inserted a rank-limit below
    // the window; the TopK heap does that bounding itself, so drop the
    // redundant (sort-based) limiter rather than paying it twice
    val child = child0 match {
      case WindowGroupLimit(_, _, RowNumber(), limit, inner) if limit >= k => inner
      case other => other
    }
    val payloadType = StructType(child.output.map(a =>
      StructField(a.name, a.dataType, a.nullable, a.metadata)))
    val payload = CreateStruct(child.output)
    val tieCast = tie.dataType match {
      case StringType | LongType => tie
      case _ => Cast(tie, LongType)
    }
    val topk = TopKByOrd(payload, Cast(ord, DoubleType), tieCast, k)
      .toAggregateExpression()
    val arrAlias = Alias(topk, "__graft_topk")()
    val agg = Aggregate(partSpec, Seq(arrAlias), child)

    val posAttr = AttributeReference("__graft_pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("__graft_row", payloadType, nullable = false)()
    val gen = Generate(PosExplode(arrAlias.toAttribute),
      unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), agg)

    // re-materialize the original output under its ORIGINAL exprIds (the
    // ids are not visible between Aggregate and here, so no conflict)
    val restored = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(rowAttr, i, Some(a.name)), a.name)(exprId = a.exprId)
    }
    val rank = Alias(Cast(Add(posAttr, Literal(1)), rn.dataType), rn.name)(
      exprId = rn.exprId)
    val proj = Project(restored :+ rank, gen)
    if (restPredicates.isEmpty) proj
    else Filter(restPredicates.reduce(And), proj)
  }
}
