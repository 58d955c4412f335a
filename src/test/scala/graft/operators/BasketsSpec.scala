package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class BasketsSpec extends SparkSuite {
  import spark.implicits._

  private def pairs(rows: Seq[(Long, Long)], minSupport: Long = 2, k: Int = 10,
      maxBasket: Option[Int] = Some(10000)): Seq[(Long, Long, Long)] =
    Baskets.frequentPairs(rows.toDF("basket", "item"), col("basket"),
      col("item"), minSupport, k, maxBasket)
      .as[(Long, Long, Long)].collect().toSeq

  test("planted co-occurrences: counts, ordering, support floor") {
    // items 1,2 together in 3 baskets; 1,3 in 2; 2,3 once (below floor)
    val rows = Seq(
      (100L, 1L), (100L, 2L),
      (101L, 1L), (101L, 2L),
      (102L, 1L), (102L, 2L), (102L, 3L),
      (103L, 1L), (103L, 3L),
      (104L, 9L)) // singleton basket: no pairs
    assert(pairs(rows) == Seq((1L, 2L, 3L), (1L, 3L, 2L)))
  }

  test("membership, not multiplicity: duplicate lines count once per basket") {
    val rows = Seq((1L, 5L), (1L, 5L), (1L, 7L), (2L, 5L), (2L, 7L))
    assert(pairs(rows) == Seq((5L, 7L, 2L)))
  }

  test("maxBasket guard drops the mega-basket entirely") {
    val mega = (1L to 50L).map(i => (999L, i))
    val small = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    val got = pairs(small ++ mega, maxBasket = Some(10))
    assert(got == Seq((1L, 2L, 2L)), got.toString)
    // unguarded, the mega-basket contributes its |b|² pairs (support 1 —
    // still filtered by the floor here, so assert at floor 1)
    val un = pairs(mega, minSupport = 1, k = 5000, maxBasket = None)
    assert(un.size == 50 * 49 / 2)
  }

  test("deterministic across partitionings, k bound respected") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(600)((rnd.nextInt(40).toLong, rnd.nextInt(15).toLong))
    val a = Baskets.frequentPairs(rows.toDF("b", "i").repartition(1),
      col("b"), col("i"), 2, 7).as[(Long, Long, Long)].collect().toSeq
    val b = Baskets.frequentPairs(rows.toDF("b", "i").repartition(19),
      col("b"), col("i"), 2, 7).as[(Long, Long, Long)].collect().toSeq
    assert(a == b && a.size <= 7)
  }
}
