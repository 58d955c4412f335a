package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Ranking-metric components against hand-computed values: recall@k and
  * MRR as exact integer components, DCG/iDCG as sums of the shared
  * scaled-integer discount literals, sentinel for the no-hit case, and
  * the retriever-returned-nothing outer-join row. */
class EvalSpec extends SparkSuite {
  import spark.implicits._

  private val k = 3
  private val d = Eval.discounts(k) // 1 -> 1e6, 2 -> 630930, 3 -> 500000

  test("discount and ideal tables are the textbook values") {
    assert(d(1) == 1000000L, "1/log2(2) = 1")
    assert(d(2) == math.round(1e6 / (math.log(3.0) / math.log(2.0))))
    assert(Eval.idealPrefix(k)(0) == 0L)
    assert(Eval.idealPrefix(k)(2) == d(1) + d(2))
    assert(Eval.idealPrefix(k)(3) == d(1) + d(2) + d(3))
  }

  test("per-query metrics match hand computation, sentinel and outer row included") {
    // q1: rel = {10, 11, 12}; top-3 = [10, 99, 12] → hits at ranks 1, 3
    // q2: rel = {20};         top-3 = [98, 97, 96] → no hit in top k
    // q3: rel = {30, 31};     retriever returned NOTHING
    val ranked = Seq(
      (1L, 1, 10L), (1L, 2, 99L), (1L, 3, 12L),
      (2L, 1, 98L), (2L, 2, 97L), (2L, 3, 96L),
      // rank 4 of q2 IS relevant but must not count at k = 3
      (2L, 4, 20L)
    ).toDF("query_id", "rank", "id")
    val rel = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (3L, 30L), (3L, 31L)).toDF("query_id", "id")
    val got = Eval.rankingMetrics(ranked, rel, k)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, 1L, d(1) + d(3),
      d(1) + d(2) + d(3))), s"${got(1L)}")
    assert(got(2L) == ((2L, 1L, 0L, -1L, 0L, d(1))), s"${got(2L)}")
    assert(got(3L) == ((3L, 2L, 0L, -1L, 0L, d(1) + d(2))), s"${got(3L)}")
    // derived metrics read off exactly: recall@3(q1) = 2/3, RR(q1) = 1/1,
    // nDCG(q1) = (d1+d3)/(d1+d2+d3)
    val (_, nRel, atK, first, dcg, idcg) = got(1L)
    assert(atK.toDouble / nRel == 2.0 / 3.0)
    assert(first == 1L)
    assert(math.abs(dcg.toDouble / idcg - 0.7039) < 1e-3)
  }
}
