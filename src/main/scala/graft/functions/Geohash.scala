package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, TernaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Base-32 geohash encoding (public algorithm, Niemeyer 2008).
  *
  * Re-implements the semantics the reference gets from the `ch.hsr:geohash`
  * library: `GeoHash.geoHashStringWithCharacterPrecision(lat, lng, 4)`
  * (reference: WeatherHotelsApp.java:74-78, MyStream.java:97-101). Conformance
  * is locked by the 8 golden hashes in the reference tests
  * (WeatherStreamsTest.java:171-177,214) — see GeohashSpec.
  *
  * Scale note: pure per-row arithmetic, no state, no allocation beyond the
  * output string — safe at any scale, and exposed as a codegen'd Catalyst
  * `Expression` (not a Scala UDF) so it stays inside whole-stage codegen
  * with primitive (unboxed) inputs.
  */
object Geohash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz".toCharArray

  /** Encode (lat, lng) to a geohash of `precision` base-32 characters. */
  def encode(lat: Double, lng: Double, precision: Int): String = {
    var latMin = -90.0; var latMax = 90.0
    var lngMin = -180.0; var lngMax = 180.0
    val out = new Array[Char](precision)
    var even = true // geohash interleaving starts with the longitude bit
    var bits = 0; var ch = 0; var pos = 0
    while (pos < precision) {
      if (even) {
        val mid = (lngMin + lngMax) / 2
        if (lng >= mid) { ch = (ch << 1) | 1; lngMin = mid }
        else { ch = ch << 1; lngMax = mid }
      } else {
        val mid = (latMin + latMax) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latMin = mid }
        else { ch = ch << 1; latMax = mid }
      }
      even = !even
      bits += 1
      if (bits == 5) { out(pos) = Base32(ch); pos += 1; bits = 0; ch = 0 }
    }
    new String(out)
  }

  /** Codegen entry point — kept separate so generated code does a single
    * static call returning the final UTF8String (no per-row String → UTF8String
    * bridge in the generated class).
    */
  def encodeUtf8(lat: Double, lng: Double, precision: Int): UTF8String =
    UTF8String.fromString(encode(lat, lng, precision))

  /** Decode a geohash to its bounding box: (latMin, latMax, lngMin, lngMax). */
  def decodeBBox(gh: String): (Double, Double, Double, Double) = {
    var latMin = -90.0; var latMax = 90.0
    var lngMin = -180.0; var lngMax = 180.0
    var even = true
    var i = 0
    while (i < gh.length) {
      val ch = gh.charAt(i)
      val cd = if (ch < 128) Base32Index(ch) else -1
      require(cd >= 0, s"invalid geohash char '$ch'")
      var b = 4
      while (b >= 0) {
        val bit = (cd >> b) & 1
        if (even) {
          val mid = (lngMin + lngMax) / 2
          if (bit == 1) lngMin = mid else lngMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if (bit == 1) latMin = mid else latMax = mid
        }
        even = !even
        b -= 1
      }
      i += 1
    }
    (latMin, latMax, lngMin, lngMax)
  }

  /** Cell-center point of a geohash. */
  def decodeCenter(gh: String): (Double, Double) = {
    val (la, lb, na, nb) = decodeBBox(gh)
    ((la + lb) / 2, (na + nb) / 2)
  }

  /** Neighboring cell `(dLat, dLng)` steps away (wraps longitude, clamps
    * latitude at the poles — matching standard geohash neighbor behavior).
    * The polar clamp means a step past a pole returns a cell already in the
    * grid — possibly the origin itself; [[neighbors]] dedupes. */
  def neighbor(gh: String, dLat: Int, dLng: Int): String = {
    val (la, lb, na, nb) = decodeBBox(gh)
    val latStep = lb - la
    val lngStep = nb - na
    val lat = math.max(-90.0 + latStep / 2,
      math.min(90.0 - latStep / 2, (la + lb) / 2 + dLat * latStep))
    var lng = (na + nb) / 2 + dLng * lngStep
    if (lng > 180.0) lng -= 360.0
    if (lng < -180.0) lng += 360.0
    encode(lat, lng, gh.length)
  }

  /** The surrounding cells (N, NE, E, SE, S, SW, W, NW order) — 8 away from
    * the poles. For polar cells the lat-clamped candidates collapse onto
    * already-listed cells (or the origin itself); those are removed rather
    * than returned as duplicates, matching the geometry: a cell touching a
    * pole genuinely has fewer than 8 distinct neighbors. */
  def neighbors(gh: String): Seq[String] = Seq(
    neighbor(gh, 1, 0), neighbor(gh, 1, 1), neighbor(gh, 0, 1),
    neighbor(gh, -1, 1), neighbor(gh, -1, 0), neighbor(gh, -1, -1),
    neighbor(gh, 0, -1), neighbor(gh, 1, -1))
    .distinct.filterNot(_ == gh)

  private val Base32Index: Array[Int] = {
    val idx = Array.fill(128)(-1)
    "0123456789bcdefghjkmnpqrstuvwxyz".zipWithIndex.foreach {
      case (c, i) => idx(c.toInt) = i
    }
    idx
  }

  /** Column API: `geohash($"lat", $"lng", 4)`. Inputs are cast to double at
    * the boundary (the expression itself expects exact types). */
  def geohash(lat: Column, lng: Column, precision: Int): Column =
    Bridge.column(GeohashEncode(
      Cast(Bridge.expression(lat), DoubleType),
      Cast(Bridge.expression(lng), DoubleType),
      Literal(precision)))
}

/** Catalyst expression: `geohash(lat, lng, precision)` → StringType.
  *
  * Null-intolerant ternary expression with full whole-stage-codegen support:
  * `doGenCode` emits one static call into [[Geohash.encodeUtf8]], so the hot
  * path is branch-free JIT'd arithmetic over unboxed doubles.
  */
case class GeohashEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // Exact input types (double, double, int) are guaranteed by the Column /
  // SQL-registration wrappers, which insert Casts ([[Geohash.geohash]],
  // [[GraftFunctions.register]]); ExpectsInputTypes is private[sql].
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "geohash"

  override def nullSafeEval(lat: Any, lng: Any, precision: Any): Any =
    Geohash.encodeUtf8(
      lat.asInstanceOf[Double], lng.asInstanceOf[Double], precision.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lng, p) =>
      s"graft.functions.Geohash.encodeUtf8($lat, $lng, $p)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GeohashEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}
