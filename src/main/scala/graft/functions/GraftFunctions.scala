package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level function library for the graft engine.
  *
  * Everything here composes built-in (codegen'd) `org.apache.spark.sql.functions`
  * — no Scala UDFs in hot paths. Reference semantics covered:
  *   - F3 composite-key synthesis  (WeatherHotelsApp.java:73,80)
  *   - F4 composite-key split      (WeatherHotelsApp.java:105, MyStream.java:124)
  *   - F1 lenient JSON numeric extraction, mirroring Jackson's
  *     `JsonNode.doubleValue()` → 0.0 coercion for non-numeric nodes
  *     (WeatherHotelsApp.java:72-81; pinned by WeatherStreamsTest.java:206-214)
  *   - vector primitives for the similarity-search extensions (dot/cosine over
  *     ARRAY<FLOAT>/ARRAY<DOUBLE> via higher-order functions, codegen'd).
  */
object GraftFunctions {

  // ---- composite keys (F3/F4) -------------------------------------------

  /** `"{part1}_{part2}"` — reference key synthesis (F3). */
  def compositeKey(parts: Column*): Column = concat_ws("_", parts: _*)

  /** n-th 1-based component of a `_`-joined composite key (F4). */
  def keyPart(key: Column, n: Int): Column = element_at(split(key, "_"), n)

  // ---- lenient JSON numeric extraction (F1 fidelity shim) ---------------

  /** Extract `field` from a JSON string column as double with Jackson
    * `doubleValue()` semantics: numeric *node* → its value, anything else
    * (quoted string, missing, malformed) → 0.0. The reference relies on this
    * (string `"11111"` lat/lng → 0.0 → geohash "s000",
    * WeatherStreamsTest.java:206-214). `get_json_object` can't express this —
    * it strips quotes, making `"11111"` and `11111` indistinguishable — so we
    * match the *unquoted* numeric token in the raw text, which preserves the
    * node-type distinction. Flat-object assumption documented; the normal
    * (non-fidelity) path is `from_json` with an explicit schema.
    */
  def jsonDoubleLenient(jsonCol: Column, field: String): Column =
    coalesce(
      nullif(regexp_extract(jsonCol,
        "\"" + field + "\"\\s*:\\s*(-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?)\\s*[,}]", 1),
        lit("")).cast("double"),
      lit(0.0))

  /** Extract `field` from a JSON string column as text (Jackson `textValue()`:
    * null when absent). */
  def jsonText(jsonCol: Column, field: String): Column =
    get_json_object(jsonCol, "$." + field)

  // ---- vector primitives (similarity-search extensions) -----------------

  /** Dot product of two equal-length array columns (codegen'd HOFs, no UDF). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Euclidean norm of an array column. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  /** Cosine similarity of two equal-length array columns; 0.0 when either
    * norm is zero (avoids NaN poisoning downstream top-k ordering). */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0d, lit(0.0d)).otherwise(dot(a, b) / denom)
  }

  // ---- registration ------------------------------------------------------

  /** Register graft scalar functions for SQL use (`SELECT geohash(lat,lng,4)`). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{DoubleType, IntegerType}
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "geohash",
      exprs => GeohashEncode(
        Cast(exprs(0), DoubleType), Cast(exprs(1), DoubleType), Cast(exprs(2), IntegerType)),
      "scala_udf")
  }
}
