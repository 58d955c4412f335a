package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  private def explodeHH(df: org.apache.spark.sql.DataFrame) = df
    .select(posexplode($"hh").as(Seq("r", "e")))
    .select($"e.item", $"e.est", $"e.err")
    .as[(String, Long, Long)].collect()

  test("exact regime: distinct <= m gives exact counts, err 0, stable order") {
    // 6 distinct items, skewed counts, across 8 partitions (merge path hot)
    val rows = (Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      Seq.fill(10)("d") ++ Seq("e", "f")).zipWithIndex
    val df = rows.toDF("item", "i").repartition(8)
    val got = explodeHH(df.agg(
      HeavyHitters.heavyHitters($"item", m = 16).as("hh")))
    assert(got.map(t => t._1 -> t._2).toMap ==
      Map("a" -> 40L, "b" -> 25L, "c" -> 10L, "d" -> 10L, "e" -> 1L, "f" -> 1L))
    assert(got.forall(_._3 == 0L), "no decrements → err bound 0")
    // est desc, item asc: the c/d tie must order c before d
    assert(got.map(_._1).toSeq == Seq("a", "b", "c", "d", "e", "f"))
  }

  test("sketch regime: MG bounds hold and guaranteed-heavy items survive") {
    // n = 2000: two heavy items (600 + 400) and 1000 distinct light items;
    // m = 15 → any item with true > n/(m+1) = 125 must be present
    val heavy = Seq.fill(600)("HEAVY_A") ++ Seq.fill(400)("HEAVY_B")
    val light = (0 until 1000).map(i => s"light_$i")
    val rows = (heavy ++ light).zipWithIndex
    val df = rows.toDF("item", "i").repartition(8)
    val truth = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val got = explodeHH(df.agg(
      HeavyHitters.heavyHitters($"item", m = 15).as("hh")))
    assert(got.nonEmpty && got.length <= 15)
    val asMap = got.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(asMap.contains("HEAVY_A") && asMap.contains("HEAVY_B"),
      s"guaranteed heavy items missing: ${got.map(_._1).toSeq}")
    got.foreach { case (item, est, err) =>
      val t = truth(item)
      assert(est <= t, s"$item: est $est must underestimate true $t")
      assert(t <= est + err, s"$item: true $t must be <= est $est + err $err")
    }
    // the error bound itself stays within the n/(m+1) analysis
    assert(got.head._3 <= 2000L / 16L + 1L,
      s"err bound ${got.head._3} above n/(m+1)")
  }

  test("grouped: per-group summaries independent; nulls ignored") {
    val df = Seq(
      ("g1", "x"), ("g1", "x"), ("g1", "y"),
      ("g2", "z"), ("g2", null)
    ).toDF("g", "item")
    val got = df.groupBy($"g")
      .agg(HeavyHitters.heavyHitters($"item", m = 4).as("hh"))
      .select($"g", posexplode($"hh").as(Seq("r", "e")))
      .select($"g", $"e.item", $"e.est").as[(String, String, Long)]
      .collect().toSet
    assert(got == Set(("g1", "x", 2L), ("g1", "y", 1L), ("g2", "z", 1L)))
  }
}
