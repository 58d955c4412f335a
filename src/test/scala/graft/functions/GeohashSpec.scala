package graft.functions

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Conformance + property tests for the geohash implementation.
  *
  * Golden vectors from the reference tests
  * (/root/reference/src/test/java/WeatherStreamsTest.java:171-177,214) pin
  * exact parity with `ch.hsr:geohash`'s
  * `geoHashStringWithCharacterPrecision`.
  */
class GeohashSpec extends SparkSuite {

  /** Run a ScalaCheck property inside a ScalaTest test (the
    * scalatest-scalacheck bridge artifact isn't in the offline cache). */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  val goldenVectors: Seq[(Double, Double, String)] = Seq(
    (39.6467, -89.8455, "dp01"),
    (35.7395, -78.3249, "dq27"),
    (36.3367, -77.113, "dq3n"),
    (39.2336, -108.67, "9wfx"),
    (36.9639, -85.3242, "dne6"),
    (0.0, 0.0, "s000"),          // the string-coerced "11111" lat/lng case
    (51.5131074, -0.1778707, "gcpv"))

  test("reference golden vectors (precision 4)") {
    goldenVectors.foreach { case (lat, lng, expected) =>
      assert(Geohash.encode(lat, lng, 4) == expected, s"($lat, $lng)")
    }
  }

  test("well-known 12-char hash (public vector)") {
    // Wikipedia's canonical example: (57.64911, 10.40744) → u4pruydqqvj8
    assert(Geohash.encode(57.64911, 10.40744, 12).startsWith("u4pruydqqvj"))
  }

  test("prefix monotonicity: precision p is a prefix of precision p+1") {
    check(Prop.forAll(Gen.chooseNum(-90.0, 90.0), Gen.chooseNum(-180.0, 180.0),
      Gen.chooseNum(1, 11)) { (lat: Double, lng: Double, p: Int) =>
      Geohash.encode(lat, lng, p + 1).startsWith(Geohash.encode(lat, lng, p))
    })
  }

  test("output alphabet is geohash base-32") {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz".toSet
    check(Prop.forAll(Gen.chooseNum(-90.0, 90.0), Gen.chooseNum(-180.0, 180.0)) {
      (lat: Double, lng: Double) =>
        Geohash.encode(lat, lng, 8).forall(alphabet.contains)
    })
  }

  test("Catalyst expression matches the Scala implementation (codegen path)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = goldenVectors.toDF("lat", "lng", "expected")
      .withColumn("got", Geohash.geohash(col("lat"), col("lng"), 4))
    assert(df.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("expression is null-safe") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq((Some(1.0), Some(1.0)), (None, Some(1.0)), (Some(1.0), None))
      .toDF("lat", "lng")
      .withColumn("h", Geohash.geohash(col("lat"), col("lng"), 4))
    assert(df.filter(col("h").isNull).count() == 2)
  }

  test("SQL registration: full graft function catalog callable from spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql("SELECT geohash(39.6467D, -89.8455D, 4) AS h").head()
    assert(row.getString(0) == "dp01")

    val r2 = spark.sql(
      """SELECT dot_double(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       sorted_intersect_count(array(1L,2L,5L), array(2L,3L,5L)) AS i,
        |       simhash64(array(7L)) AS s,
        |       size(minhash_sig(array(1L,2L,3L), 8)) AS m,
        |       size(shingle_hashes(array(1L,2L,3L,4L), 3)) AS n""".stripMargin).head()
    assert(r2.getDouble(0) == 11.0)
    assert(r2.getInt(1) == 2)
    assert(r2.getLong(2) == 7L) // single hash: bits pass through sign-count
    assert(r2.getInt(3) == 8)
    assert(r2.getInt(4) == 2)
  }

  test("decode: bbox of encode(p) contains p; center re-encodes to same hash") {
    check(Prop.forAll(Gen.chooseNum(-89.9, 89.9), Gen.chooseNum(-179.9, 179.9)) {
      (lat: Double, lng: Double) =>
        val gh = Geohash.encode(lat, lng, 6)
        val (la, lb, na, nb) = Geohash.decodeBBox(gh)
        val (cLat, cLng) = Geohash.decodeCenter(gh)
        la <= lat && lat <= lb && na <= lng && lng <= nb &&
          Geohash.encode(cLat, cLng, 6) == gh
    })
  }

  test("neighbors: 8 distinct cells, symmetric steps, same precision") {
    val gh = "u09t"
    val ns = Geohash.neighbors(gh)
    assert(ns.size == 8 && ns.distinct.size == 8)
    assert(ns.forall(_.length == 4) && !ns.contains(gh))
    // east of west is self (away from poles/antimeridian)
    assert(Geohash.neighbor(Geohash.neighbor(gh, 0, -1), 0, 1) == gh)
    assert(Geohash.neighbor(Geohash.neighbor(gh, 1, 0), -1, 0) == gh)
  }

  test("polar cells return fewer, distinct, non-self neighbors") {
    // a cell touching the north pole: stepping north clamps back into the
    // grid — the collapsed candidates must be deduped, not returned as
    // duplicates or the origin itself
    val polar = Geohash.encode(89.9, 10.0, 4)
    val ns = Geohash.neighbors(polar)
    assert(ns.distinct.size == ns.size, "no duplicate neighbors")
    assert(!ns.contains(polar), "origin must not be its own neighbor")
    assert(ns.size < 8, s"polar cell has < 8 distinct neighbors, got ${ns.size}")
    assert(ns.nonEmpty)
  }

  test("neighbors wrap the antimeridian") {
    val east = Geohash.encode(10.0, 179.99, 4)
    val wrapped = Geohash.neighbor(east, 0, 1)
    val (_, _, na, nb) = Geohash.decodeBBox(wrapped)
    assert(na >= -180.0 && nb <= -179.0, s"expected west-side cell, got ($na, $nb)")
  }

  test("GraftExtensions end-to-end: a session built with the extensions runs SQL") {
    import org.apache.spark.sql.SparkSession
    // force a NEW SparkSession over the shared context so withExtensions
    // actually applies (getOrCreate would return the suite session)
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      val gh = s2.sql("SELECT geohash(39.6467, -89.8455, 4) AS g").head().getString(0)
      assert(gh == "dp01") // reference golden vector
      val d = s2.sql("SELECT dot_double(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(d == 11.0)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("GraftExtensions injects the same catalog at session-build time") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext) // must not throw; names covered above
  }
}
