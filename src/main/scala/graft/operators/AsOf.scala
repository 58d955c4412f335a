package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent right row
  * with `rightTime <= leftTime` on the same key. Spark has no built-in; the
  * composition here is the union + running-`last(ignoreNulls)` window trick:
  *
  *  1. tag and union both sides on (key, time);
  *  2. one window per key ordered by (time, side) carries the latest right
  *     payload forward (`last(_, ignoreNulls = true)` over an unbounded-
  *     preceding frame — right rows sort BEFORE left rows at equal time, so
  *     `<=` is inclusive);
  *  3. keep the left rows.
  *
  * Scale shape: ONE shuffle on the key (both sides together) + one in-
  * partition sort — strictly cheaper than the naive inequality join
  * (which explodes to all time-pairs before filtering) and equivalent to
  * the sort-merge as-of algorithms in time-series stores. Ties between
  * right rows at the same instant resolve deterministically by `rightOrd`
  * (highest wins).
  *
  * `inner = false` keeps left rows with no matching right row (null
  * payload).
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], rightOrd: Column,
      inner: Boolean = true): DataFrame =
    joinDir(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightOrd, inner, forward = false)

  /** FORWARD as-of (pandas `merge_asof(direction='forward')`): for each
    * left row, the EARLIEST right row with `rightTime >= leftTime` on the
    * same key — the same single-exchange union-window plan as [[join]]
    * with the scan order reversed (right rows still sort before left
    * rows at equal time, so `>=` is inclusive; same-instant right ties
    * resolve to the highest `rightOrd`, the [[join]] contract). */
  def joinForward(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], rightOrd: Column,
      inner: Boolean = true): DataFrame =
    joinDir(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightOrd, inner, forward = true)

  private def joinDir(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], rightOrd: Column,
      inner: Boolean, forward: Boolean): DataFrame = {
    val lCols = left.columns
    val l = left.select(
      leftKey.as("__k"), leftTime.as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__ord"),
      struct(lCols.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(
        org.apache.spark.sql.types.StructType(
          rightPayload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))).as("__r"))
    // Null-key right rows can never match under equi-join semantics, but the
    // window partition would happily group them WITH null-key left rows and
    // hand those a payload — filter them out before the union. Null-key left
    // rows then see no right row in their partition: `__asof` stays null, so
    // inner drops them and left-outer keeps them null — exactly a SQL
    // equi-join's null treatment. Null-TIME right rows are dropped for the
    // same reason: the ascending sort puts nulls FIRST, so an unfiltered
    // null-time row would become the carried match for every left row that
    // precedes the first real right row — but `NULL <= t` is never true in
    // the SQL formulation this operator mirrors.
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"),
      lit(0).as("__side"), rightOrd.cast("long").as("__ord"),
      lit(null).cast(l.schema("__l").dataType).as("__l"),
      struct(rightPayload.map(col): _*).as("__r"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)

    // right rows first at equal time (side 0 < 1); among same-time right
    // rows the highest ordinal lands last → it is what `last` carries.
    // Forward direction reverses the TIME scan only: the side/ord
    // tie-breaks keep the identical equal-time semantics.
    val w = Window.partitionBy(col("__k"))
      .orderBy(if (forward) col("__t").desc else col("__t").asc,
        col("__side"), col("__ord").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      // null-TIME left rows never match (`NULL <= t` / `NULL >= t` is
      // never true). Backward gets this for free — asc sorts nulls
      // FIRST, before any right row — but the forward scan's desc sort
      // puts them LAST, where the window hands them the final carried
      // payload (caught by the PropertiesSpec forward/nearest reference
      // property). Explicit for both directions.
      .withColumn("__asof",
        when(col("__t").isNull, lit(null)).otherwise(col("__asof")))
      .filter(col("__side") === 1)

    val matched = if (inner) carried.filter(col("__asof").isNotNull) else carried
    matched.select(
      (lCols.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__asof.$c").as(c))): _*)
  }

  /** NEAREST as-of (pandas `merge_asof(direction='nearest')`): for each
    * left row, whichever of the backward champion (latest right ≤ t) and
    * the forward champion (earliest right ≥ t) is CLOSER in absolute
    * time; an exact tie — including a right row AT the left instant,
    * which both directions claim — resolves to the backward match.
    * Same-instant right ties resolve to the highest `rightOrd` first,
    * exactly like [[join]]/[[joinForward]].
    *
    * Plan: ONE key exchange feeding TWO windows over opposite time
    * sorts (Catalyst re-sorts in place — the hash partitioning is
    * already satisfied, so no second shuffle), then a narrow gap
    * comparison in epoch micros. Times may be DATE/TIMESTAMP (converted
    * via an internal timestamp cast) or any numeric castable to long.
    *
    * `inner = false` keeps left rows with no right row at all. */
  def joinNearest(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], rightOrd: Column,
      inner: Boolean = true): DataFrame = {
    val lCols = left.columns
    def us(t: Column, df: DataFrame, probe: Column): Column =
      df.select(probe).schema.head.dataType match {
        case _: org.apache.spark.sql.types.DateType |
             _: org.apache.spark.sql.types.TimestampType |
             _: org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(t.cast("timestamp"))
        case _ => t.cast("long")
      }
    val rStruct = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)) :+
        org.apache.spark.sql.types.StructField("__rt",
          org.apache.spark.sql.types.LongType))
    val l = left.select(
      leftKey.as("__k"), leftTime.as("__t"),
      us(leftTime, left, leftTime).as("__tus"),
      lit(1).as("__side"), lit(null).cast("long").as("__ord"),
      struct(lCols.toIndexedSeq.map(col): _*).as("__l"),
      lit(null).cast(rStruct).as("__r"))
    val r = right.select(
      rightKey.as("__k"), rightTime.as("__t"),
      lit(null).cast("long").as("__tus"),
      lit(0).as("__side"), rightOrd.cast("long").as("__ord"),
      lit(null).cast(l.schema("__l").dataType).as("__l"),
      struct(rightPayload.map(col) :+
        us(rightTime, right, rightTime).as("__rt"): _*).as("__r"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
    def w(desc: Boolean) = Window.partitionBy(col("__k"))
      .orderBy(if (desc) col("__t").desc else col("__t").asc,
        col("__side"), col("__ord").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__b", last(col("__r"), ignoreNulls = true).over(w(desc = false)))
      .withColumn("__f", last(col("__r"), ignoreNulls = true).over(w(desc = true)))
      .filter(col("__side") === 1)
    val gapB = col("__tus") - col("__b.__rt")
    val gapF = col("__f.__rt") - col("__tus")
    val pick = when(col("__b").isNull, col("__f"))
      .when(col("__f").isNull, col("__b"))
      .otherwise(when(gapF < gapB, col("__f")).otherwise(col("__b")))
    // null-TIME left rows never match (same rule as joinDir: the desc
    // forward window would otherwise hand them a champion)
    val chosen = carried.withColumn("__asof",
      when(col("__t").isNull, lit(null)).otherwise(pick))
    val matched = if (inner) chosen.filter(col("__asof").isNotNull) else chosen
    matched.select(
      (lCols.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__asof.$c").as(c))): _*)
  }

  /** [[join]]/[[joinForward]]/[[joinNearest]] with a TOLERANCE bound
    * (pandas `merge_asof(tolerance=…)` semantics, for all three
    * `direction`s): the carried match only counts if the right row is
    * within `tolerance` of the left time — a match outside the bound is
    * treated as NO match (dropped under `inner`, null payload
    * otherwise). The tolerance check rides the underlying direction's
    * single-exchange union-window plan: the carried payload is augmented
    * with the right row's time and the bound is a post-window predicate,
    * so there is no second shuffle and never an inequality-join
    * explosion.
    *
    * Note the nearest+tolerance composition matches pandas: the
    * champion is picked FIRST (closest in absolute time, ties backward)
    * and the bound applied to it — a left row whose nearest match is
    * out-of-tolerance gets NO match even if nothing else is in range,
    * because nothing closer exists by construction.
    *
    * `tolerance` is an interval/duration Column (e.g.
    * `expr("interval 7 days")`). `rightTimeOut` names the carried
    * right-time column in the output (callers often want the gap). */
  def joinWithin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightPayload: Seq[String], rightOrd: Column,
      tolerance: Column, inner: Boolean = true,
      rightTimeOut: String = "matched_time",
      direction: String = "backward"): DataFrame = {
    require(!rightPayload.contains(rightTimeOut),
      s"rightTimeOut '$rightTimeOut' collides with a payload column")
    // the left side keeps ALL its columns in the output, so a left column
    // named rightTimeOut would silently produce a duplicate/ambiguous
    // column in the post-join select — fail loudly instead
    require(!left.columns.contains(rightTimeOut),
      s"rightTimeOut '$rightTimeOut' collides with a left column")
    val rightAug = right.withColumn(rightTimeOut, rightTime)
    val lCols = left.columns.toIndexedSeq
    val aug = rightPayload :+ rightTimeOut
    val joined = direction match {
      case "backward" => join(left, rightAug, leftKey, rightKey, leftTime,
        col(rightTimeOut), aug, rightOrd, inner = false)
      case "forward" => joinForward(left, rightAug, leftKey, rightKey,
        leftTime, col(rightTimeOut), aug, rightOrd, inner = false)
      case "nearest" => joinNearest(left, rightAug, leftKey, rightKey,
        leftTime, col(rightTimeOut), aug, rightOrd, inner = false)
      case other => throw new IllegalArgumentException(
        s"direction must be backward|forward|nearest, got '$other'")
    }
    // per-direction bound, each a one-sided interval predicate except
    // nearest (|gap| <= tolerance, as the two one-sided checks):
    //   backward: left - matched <= tol  ⇔  matched + tol >= left
    //   forward : matched - left <= tol  ⇔  left + tol >= matched
    val mt = col(rightTimeOut)
    val inTol = mt.isNotNull && (direction match {
      case "backward" => mt + tolerance >= leftTime
      case "forward"  => leftTime + tolerance >= mt
      case _ => (mt <= leftTime && mt + tolerance >= leftTime) ||
        (mt >= leftTime && leftTime + tolerance >= mt)
    })
    val nulled = joined.select(
      (lCols.map(col) ++ aug.map(c =>
        when(inTol, col(c)).otherwise(lit(null)).as(c))): _*)
    if (inner) nulled.filter(col(rightTimeOut).isNotNull) else nulled
  }
}
