package graft

import graft.operators.{Dedup, WeatherOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Engine-level invariants (SURVEY.md §5.4): properties that must hold for
  * any input, checked over generated data.
  */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val docGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 12)
    texts <- Gen.listOfN(n, Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
      .map(_.mkString(" ")))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("dedup idempotence: dedupCorpus(dedupCorpus(x)) == dedupCorpus(x)") {
    check(Prop.forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val once = Dedup.dedupCorpus(df, threshold = 0.6)
      val twice = Dedup.dedupCorpus(once, threshold = 0.6)
      once.select($"doc_id").as[Long].collect().toSet ==
        twice.select($"doc_id").as[Long].collect().toSet
    }, n = 15)
  }

  test("exact dedup: survivor count == distinct keys; dup counts sum to input") {
    check(Prop.forAll(docGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val dd = Dedup.exact(df, "text", "doc_id")
      val distinctTexts = docs.map(_._2).distinct.size
      dd.count() == distinctTexts &&
        dd.agg(sum($"n_dups")).head().getLong(0) == docs.size
    }, n = 20)
  }

  test("avg invariant: dailyAverage equals sum/count for any grouping") {
    val readingsGen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        d <- Gen.oneOf("2020-01-01", "2020-01-02")
        v <- Gen.chooseNum(-100.0, 150.0)
      } yield (k, d, v, v / 2))
    } yield rows
    check(Prop.forAll(readingsGen) { rows =>
      val df = rows.toDF("key", "wthr_date", "tmp_f", "tmp_c")
      val got = WeatherOps.dailyAverage(df)
        .select($"key", $"wthr_date", $"avg_tmp_f")
        .as[(String, String, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val expected = rows.groupBy(r => (r._1, r._2))
        .map { case (k, rs) => k -> rs.map(_._3).sum / rs.size }
      expected.forall { case (k, v) => math.abs(got(k) - v) < 1e-9 }
    }, n = 20)
  }

  test("join bounds: |inner| <= |left| * max-group(right); left keeps all rows") {
    val dimGen = Gen.listOfN(10, Gen.chooseNum(0L, 6L))
    check(Prop.forAll(dimGen, dimGen) { (leftKeys, rightKeys) =>
      val l = leftKeys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "lv")
      val r = rightKeys.zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "rv")
      val hist = r.groupBy($"key").agg(collect_list($"rv").as("weather_list"))
      val inner = WeatherOps.enrich(l, hist).count()
      val left = WeatherOps.enrichLeft(l, hist).count()
      inner <= l.count() && left == l.count()
    }, n = 20)
  }

  test("latest-per-key: idempotent and order-insensitive") {
    val rowsGen = for {
      n <- Gen.chooseNum(1, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c", "d")
        o <- Gen.chooseNum(0L, 1000L)
      } yield (k, o, s"v$o"))
    } yield rows
    check(Prop.forAll(rowsGen) { rows =>
      val distinctOrd = rows.map(r => (r._1, r._2)).distinct
        .map { case (k, o) => (k, o, s"v$o") }
      val a = WeatherOps.latestPerKey(distinctOrd.toDF("key", "ord", "v"),
        Seq("key"), "ord").as[(String, Long, String)].collect().toSet
      val b = WeatherOps.latestPerKey(distinctOrd.reverse.toDF("key", "ord", "v"),
        Seq("key"), "ord").as[(String, Long, String)].collect().toSet
      a == b && a.size == distinctOrd.map(_._1).distinct.size
    }, n = 15)
  }
}
