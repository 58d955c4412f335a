package graft.plans

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Min
import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.{SortKeyBytes, TopKByOrd}

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
  *    double cast is exact (float/double/int and narrower) OR a LONG
  *    (compared natively in the aggregate — lossless, no 2⁵³ double-cast
  *    collisions), and `tie` is an integral or string (the aggregate's
  *    tie contract; nullable strings are skipped) — the primitive-compare
  *    fast shape; OR the ORDER BY is ANY list of all-atomic keys — one
  *    key or many, ascending (bottom-k) or descending or mixed, explicit
  *    null orderings, strings/decimals(≤18)/dates/timestamps included —
  *    which rides the [[graft.functions.SortKeyBytes]] memcomparable
  *    encoding as the aggregate's tie (constant ord): ascending byte
  *    order equals the window's row order exactly, including Spark's
  *    NaN-greatest and −0.0 < 0.0 float semantics. Non-atomic sort keys
  *    (arrays/structs/maps, wide decimals) keep the window form.
  *
  * Null ordering is emulated exactly by sentinel substitution: a null
  * `ord` under NULLS LAST becomes -Infinity / Long.MinValue (NULLS
  * FIRST: +Infinity / Long.MaxValue), a null integral `tie` becomes
  * Long.MinValue/MaxValue — the one observable deviation is data that
  * actually CONTAINS those sentinel values, which then sorts equal to
  * (instead of strictly before/after) the null rows; `row_number` among
  * such exact ties is arbitrary anyway.
  *
  * `rank() = 1` / `dense_rank() = 1` (equal on the FULL sort key to the
  * per-group extreme — identical semantics for both functions at k = 1,
  * including ties, which `row_number` would split) rewrites to a partial
  * aggregate + join instead: `min(struct(normalized sort key))` per
  * group, joined back null-safely — map-side partials replace the
  * per-group window sort, and ties survive because every row equal to
  * the extreme joins. `dense_rank() <= k` with k > 1 similarly becomes
  * the k extreme DISTINCT sort keys per group (partial-agg distinct,
  * then row_number over the per-group distinct keys — a relation of
  * distinct-key cardinality, not corpus cardinality) joined back;
  * `rank() <= k` with k > 1 is not expressible this way (rank skips
  * positions after ties) and keeps the window form. In the k = 1
  * min-struct leg, sort keys normalize to (null-flag, value) pairs;
  * descending keys are supported for integrals via the overflow-free
  * order reversal `-1 - x`, floats/doubles/strings descending are
  * skipped (NaN breaks negation). The k > 1 distinct-key leg has no
  * such restriction — its inner window orders the distinct keys
  * natively (original directions and null orderings), so both
  * directions of every atomic type fire.
  * These rewrites duplicate the window's input subtree into the
  * aggregate leg, so they fire only when that subtree is
  * re-instantiable with fresh attribute ids (projects / filters /
  * aggregates / joins / unions / sorts over multi-instance leaf
  * relations — scans, local and cached relations; rank over a groupBy,
  * over an enriched join, or over a union of shards — the canonical
  * "top group per key" shapes — fall inside) AND fully
  * deterministic — a rand()/uuid()/monotonically_increasing_id() below
  * the window, or in the partition/sort keys, would be re-drawn
  * independently per leg, so those bail to the window form (the same
  * gate Spark's own duplication-based rewrites apply); anything more
  * exotic keeps the window form.
  *
  * Output attribute ids are preserved (payload struct fields and the rank
  * column re-aliased to their original exprIds), so parent operators are
  * untouched. Enabled by default when the rule is installed; opt out with
  * `spark.graft.rewriteWindowTopK=false`.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] with PredicateHelper {

  private val enabledKey = "spark.graft.rewriteWindowTopK"

  /** Order-exact ord types: ≤ 32-bit integrals + floats compare via the
    * (exact) double cast; LONG compares natively in the aggregate. */
  private def ordSafe(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | IntegerType | ShortType | ByteType |
         LongType => true
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
          Seq(alias @ Alias(WindowExpression(fn,
            WindowSpecDefinition(_, _, frame)), _)),
          partSpec, orderSpec, child, _)) =>
        val rn = alias.toAttribute
        val conjuncts = splitConjunctivePredicates(cond)
        val bound: Option[(Expression, Int)] =
          conjuncts.iterator.map(c => c -> boundOf(c, rn))
            .collectFirst { case (c, Some(k)) => (c, k) }
        (fn, frame, bound, orderSpec) match {
          case (RowNumber(),
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow),
              Some((boundConjunct, k)),
              Seq(SortOrder(ord, Descending, ordNulls, _),
                SortOrder(tie, Ascending, tieNulls, _)))
              if k >= 1 && ordSafe(ord.dataType) &&
                tieSafe(tie.dataType) &&
                !(tie.nullable && tie.dataType == StringType) =>
            val ordIsLong = ord.dataType == LongType
            val ordSafeExpr =
              if (!ord.nullable) ord
              else if (ordIsLong) Coalesce(Seq(ord, Literal(
                if (ordNulls == NullsFirst) Long.MaxValue else Long.MinValue,
                LongType)))
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
          // General row_number leg: ANY all-atomic ORDER BY — ascending
          // (bottom-k), multi-key, mixed directions, explicit null
          // orderings — via the SortKeyBytes memcomparable encoding: the
          // whole sort key packs into one byte array whose unsigned byte
          // order IS the window's row order, passed as the aggregate's
          // ascending tie under a constant ord. The specialized
          // (ord DESC, tie ASC) case above keeps its primitive compare
          // (no per-row encoding) for the classic shape.
          case (RowNumber(),
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow),
              Some((boundConjunct, k)), _)
              if k >= 1 && orderSpec.nonEmpty &&
                orderSpec.forall(so => SortKeyBytes.supported(so.child.dataType)) =>
            val rest = conjuncts.filterNot(_ eq boundConjunct)
            rewrite(child, partSpec, Literal(0L),
              SortKeyBytes.fromSortOrder(orderSpec), k, rn, rest)
          // rank functions are frame-insensitive; the analyzer writes a
          // RANGE frame, the optimizer may normalize it to ROW — accept
          // both spellings of (unbounded preceding, current row)
          case (_: Rank | _: DenseRank,
              SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow),
              Some((boundConjunct, 1)), _) =>
            val rest = conjuncts.filterNot(_ eq boundConjunct)
            rewriteRankOne(child, partSpec, orderSpec, rn, rest).getOrElse(f)
          // dense_rank() <= k, k > 1: top-k DISTINCT sort keys + join back.
          // rank() <= k with k > 1 is NOT expressible this way (rank skips
          // values after ties) and must keep the window form — boundOf
          // already yields it only here via the DenseRank match.
          case (_: DenseRank,
              SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow),
              Some((boundConjunct, k)), _) if k > 1 =>
            val rest = conjuncts.filterNot(_ eq boundConjunct)
            rewriteDenseRankK(child, partSpec, orderSpec, k, rn, rest)
              .getOrElse(f)
          case _ => f
        }
    }
  }

  /** Normalize one sort key for the rank-1 aggregate+join: a (null-flag,
    * value) pair whose ascending struct-min order equals the SortOrder —
    * the flag (−1 nulls-first / 1 nulls-last / 0 otherwise) makes null
    * placement explicit; descending integrals reverse losslessly via
    * `-1 - x` in long (no MinValue overflow, unlike negation);
    * float/double values normalize −0.0/NaN so grouping-equality and
    * sort-tie semantics agree. None = shape not provably reversible. */
  private def normKey(so: SortOrder): Option[Seq[Expression]] = {
    val e = so.child
    val flag = If(IsNull(e),
      Literal(if (so.nullOrdering == NullsFirst) -1 else 1), Literal(0))
    val atomic = e.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | BinaryType | DateType |
           TimestampType | TimestampNTZType | _: DecimalType => true
      case _ => false
    }
    so.direction match {
      case Ascending if atomic =>
        val v = e.dataType match {
          case FloatType | DoubleType => NormalizeNaNAndZero(e)
          case _ => e
        }
        Some(Seq(flag, v))
      case Descending => e.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Some(Seq(flag, Subtract(Literal(-1L), Cast(e, LongType))))
        case _ => None
      }
      case _ => None
    }
  }

  /** The rank rewrites duplicate the window's input subtree into a second
    * leg, so each leg must recompute the SAME relation: any
    * non-deterministic expression below the window (rand(), uuid(),
    * monotonically_increasing_id()) — or in the partition/sort keys —
    * would be re-drawn independently per leg, making the aggregate's
    * extreme (or distinct-key set) disagree with the probe side. The
    * window form is well-defined on one materialization; the split form
    * is not — bail, the same gate Spark's own duplication-based rewrites
    * apply via `plan.deterministic`. */
  private def duplicationSafe(child: LogicalPlan, partSpec: Seq[Expression],
      orderSpec: Seq[SortOrder]): Boolean =
    !child.exists(p => p.expressions.exists(!_.deterministic)) &&
      (partSpec ++ orderSpec).forall(_.deterministic)

  /** `rank()/dense_rank() = 1` → keep every row whose full sort key
    * null-safe-equals its group's `min(struct(normalized keys))` — a
    * partial aggregate + join back, no per-group sort, ties preserved.
    * The aggregate leg re-reads the window input, so the subtree is
    * duplicated with FRESH attribute ids (optimizer rules and physical
    * binding assume globally unique ids); bail (None) when the subtree
    * holds nodes this rule cannot re-instantiate, or anything
    * non-deterministic (see [[duplicationSafe]]). */
  private def rewriteRankOne(child0: LogicalPlan, partSpec: Seq[Expression],
      orderSpec: Seq[SortOrder], rn: Attribute,
      restPredicates: Seq[Expression]): Option[LogicalPlan] = {
    val child = child0 match {
      case WindowGroupLimit(_, _, _, limit, inner) if limit >= 1 => inner
      case other => other
    }
    if (!duplicationSafe(child, partSpec, orderSpec)) return None
    val keys = orderSpec.map(normKey)
    if (keys.isEmpty || keys.exists(_.isEmpty)) return None
    val sortKey = CreateStruct(keys.flatten.flatten)
    freshCopy(child).map { fresh =>
      val attrMap = AttributeMap(child.output.zip(fresh.output))
      def remap(e: Expression): Expression = e.transform {
        case a: Attribute => attrMap.getOrElse(a, a)
      }
      val rPart = partSpec.map(remap)
      val gAliases = rPart.zipWithIndex.map { case (e, i) =>
        Alias(e, s"__graft_g$i")()
      }
      val mAlias = Alias(
        Min(remap(sortKey)).toAggregateExpression(), "__graft_min")()
      val agg = Aggregate(rPart, gAliases :+ mAlias, fresh)
      val cond = (partSpec.zip(gAliases).map { case (l, g) =>
        EqualNullSafe(l, g.toAttribute)
      } :+ EqualNullSafe(sortKey, mAlias.toAttribute)).reduce(And)
      val join = Join(child, agg, Inner, Some(cond), JoinHint.NONE)
      val rank = Alias(Cast(Literal(1), rn.dataType), rn.name)(
        exprId = rn.exprId)
      val proj = Project((child.output: Seq[NamedExpression]) :+ rank, join)
      if (restPredicates.isEmpty) proj
      else Filter(restPredicates.reduce(And), proj)
    }
  }

  /** Per-key value for the dense-rank distinct-key leg: grouping-equality
    * must agree with the window's sort-tie equality, so floats/doubles
    * normalize NaN/−0.0; direction and null placement are handled
    * NATIVELY by the inner window's SortOrder, so BOTH directions of
    * every atomic type are supported here — no `-1 - x` reversal, unlike
    * the k = 1 min-struct path. None = non-atomic (array/struct/map sort
    * keys keep the window form). */
  private def denseKeyValue(so: SortOrder): Option[Expression] = {
    val atomic = so.child.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | BinaryType | DateType |
           TimestampType | TimestampNTZType | _: DecimalType => true
      case _ => false
    }
    if (!atomic) None
    else Some(so.child.dataType match {
      case FloatType | DoubleType => NormalizeNaNAndZero(so.child)
      case _ => so.child
    })
  }

  /** `dense_rank() <= k` (k > 1) → the k extreme DISTINCT sort keys per
    * group + join back: a partial-agg distinct over (group, normalized
    * keys) — map-side combine collapses duplicate keys before the shuffle
    * — then `row_number` over the distinct keys (row_number on distincts
    * IS dense_rank) on a relation of per-group distinct-key cardinality,
    * not corpus cardinality, ordered by the ORIGINAL directions and null
    * orderings, and an equi-join that both restores every qualifying row
    * and carries the rank value. The "top 3 scores per group including
    * ties" idiom — descending doubles/strings included. `rank() <= k`
    * with k > 1 does NOT reduce to this (rank skips positions after
    * ties) and keeps the window form. */
  private def rewriteDenseRankK(child0: LogicalPlan, partSpec: Seq[Expression],
      orderSpec: Seq[SortOrder], k: Int, rn: Attribute,
      restPredicates: Seq[Expression]): Option[LogicalPlan] = {
    val child = child0 match {
      case WindowGroupLimit(_, _, _, limit, inner) if limit >= k => inner
      case other => other
    }
    if (!duplicationSafe(child, partSpec, orderSpec)) return None
    val keyVals = orderSpec.map(denseKeyValue)
    if (keyVals.isEmpty || keyVals.exists(_.isEmpty)) return None
    val vals = keyVals.flatten
    freshCopy(child).map { fresh =>
      val attrMap = AttributeMap(child.output.zip(fresh.output))
      def remap(e: Expression): Expression = e.transform {
        case a: Attribute => attrMap.getOrElse(a, a)
      }
      val gAliases = partSpec.map(remap).zipWithIndex.map { case (e, i) =>
        Alias(e, s"__graft_g$i")()
      }
      val keyAliases = vals.zipWithIndex.map { case (v, i) =>
        Alias(remap(v), s"__graft_key$i")()
      }
      val distinct = Aggregate(
        gAliases.map(_.child) ++ keyAliases.map(_.child),
        gAliases ++ keyAliases, fresh)
      val gAttrs: Seq[Expression] = gAliases.map(_.toAttribute)
      val keyOrder = keyAliases.zip(orderSpec).map { case (ka, so) =>
        SortOrder(ka.toAttribute, so.direction, so.nullOrdering, Seq.empty)
      }
      val rkAlias = Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(gAttrs, keyOrder,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
        "__graft_rk")()
      val win = Window(Seq(rkAlias), gAttrs, keyOrder, distinct, None)
      val filt = Filter(
        LessThanOrEqual(rkAlias.toAttribute, Literal(k)), win)
      val cond = (partSpec.zip(gAliases).map { case (l, g) =>
        EqualNullSafe(l, g.toAttribute)
      } ++ vals.zip(keyAliases).map { case (v, ka) =>
        EqualNullSafe(v, ka.toAttribute)
      }).reduce(And)
      val join = Join(child, filt, Inner, Some(cond), JoinHint.NONE)
      val rank = Alias(Cast(rkAlias.toAttribute, rn.dataType), rn.name)(
        exprId = rn.exprId)
      val proj = Project((child.output: Seq[NamedExpression]) :+ rank, join)
      if (restPredicates.isEmpty) proj
      else Filter(restPredicates.reduce(And), proj)
    }
  }

  /** Re-instantiate a plan subtree with fresh attribute ids everywhere:
    * leaf relations via `MultiInstanceRelation.newInstance`,
    * project/aggregate aliases regenerated; `transformUpWithNewOutput`
    * rewrites the references in between — including join conditions,
    * whose referenced child attributes remap automatically. Only
    * projects / filters / aggregates / joins / unions / sorts over
    * multi-instance leaves are supported — None otherwise (the "top
    * group per key" shape, rank over a groupBy, over an enriched join,
    * or over a union of corpus shards all fall inside;
    * generators/windows below bail, as does any subquery expression —
    * duplicating one would clone its inner plan with its attribute ids). */
  private def freshCopy(plan: LogicalPlan): Option[LogicalPlan] = {
    val unsupported = plan.collectFirst {
      // Union: multi-shard corpus inputs — output attrs derive from the
      // first child's, so the child re-instancing propagates through.
      // Sort: harmless to duplicate (the aggregate leg is order-blind).
      case p if !(p.isInstanceOf[Project] || p.isInstanceOf[Filter] ||
        p.isInstanceOf[Aggregate] || p.isInstanceOf[Join] ||
        p.isInstanceOf[Union] || p.isInstanceOf[Sort] ||
        (p.isInstanceOf[LeafNode] && p.isInstanceOf[MultiInstanceRelation])) => p
      case p if p.expressions.exists(_.exists(_.isInstanceOf[PlanExpression[_]])) => p
    }
    if (unsupported.nonEmpty) return None
    def regen(exprs: Seq[NamedExpression]): Seq[(NamedExpression, NamedExpression)] =
      exprs.map {
        case a: Alias =>
          (a, Alias(a.child, a.name)(qualifier = a.qualifier,
            explicitMetadata = a.explicitMetadata,
            nonInheritableMetadataKeys = a.nonInheritableMetadataKeys))
        case o => (o, o)
      }
    def mapping(pairs: Seq[(NamedExpression, NamedExpression)]) =
      pairs.collect { case (a: Alias, na) => (a.toAttribute, na.toAttribute) }
    Some(plan.transformUpWithNewOutput {
      case m: LeafNode =>
        val n = m.asInstanceOf[MultiInstanceRelation].newInstance()
          .asInstanceOf[LogicalPlan]
        (n, m.output.zip(n.output))
      case p: Project if p.projectList.exists(_.isInstanceOf[Alias]) =>
        val pairs = regen(p.projectList)
        (Project(pairs.map(_._2), p.child), mapping(pairs))
      case a: Aggregate if a.aggregateExpressions.exists(_.isInstanceOf[Alias]) =>
        val pairs = regen(a.aggregateExpressions)
        (Aggregate(a.groupingExpressions, pairs.map(_._2), a.child),
          mapping(pairs))
    })
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
      case StringType | LongType | BinaryType => tie
      case _ => Cast(tie, LongType)
    }
    // LONG ords go to the aggregate uncast — it compares them natively
    // (lossless); everything else rides the exact double cast
    val ordCast =
      if (ord.dataType == LongType) ord else Cast(ord, DoubleType)
    val topk = TopKByOrd(payload, ordCast, tieCast, k)
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
