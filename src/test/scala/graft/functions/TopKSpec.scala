package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSuite {
  import spark.implicits._

  test("topKByOrd == window row_number formulation on fixture events") {
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"event_id", $"value")
    val agg = ev.groupBy($"user_id")
      .agg(TopK.topKByOrd($"event_id", $"value", $"event_id", 3).as("top"))
      .select($"user_id", $"top").as[(Long, Seq[Long])]
      .collect().toMap
    val win = ev.withColumn("rn", row_number().over(
      Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")))
      .filter($"rn" <= 3)
      .select($"user_id", $"event_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => r._2).map(_._2)).toMap
    assert(agg.keySet == win.keySet)
    agg.foreach { case (u, top) =>
      assert(top.sorted == win(u).toSeq.sorted, s"user $u: $top vs ${win(u).toSeq}")
      // and the aggregate's own order is best-first (value desc, id asc)
      val vals = ev.filter($"user_id" === u)
        .select($"event_id", $"value").as[(Long, Double)].collect().toMap
      val resorted = top.sortBy(id => (-vals(id), id))
      assert(top == resorted, s"user $u: output not best-first")
    }
  }

  test("ties break on lower tie; nulls ignored; k exceeding group size is fine") {
    val df = Seq(
      ("g", 5.0, 1L), ("g", 5.0, 2L), ("g", 3.0, 3L),
      ("h", 1.0, 9L))
      .toDF("grp", "score", "id")
      .union(Seq(("g", null.asInstanceOf[java.lang.Double], 99L))
        .toDF("grp", "score", "id"))
    val got = df.groupBy($"grp")
      .agg(TopK.topKByOrd($"id", $"score", $"id", 2).as("top"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("g") == Seq(1L, 2L), "equal scores: lower id first; null row ignored")
    assert(got("h") == Seq(9L), "k larger than the group returns the whole group")
  }

  test("SQL surface: topk_by_ord resolves as an aggregate in plain SQL") {
    GraftFunctions.register(spark)
    Seq(("g", 5.0, 1L), ("g", 9.0, 2L), ("g", 7.0, 3L))
      .toDF("grp", "score", "id").createOrReplaceTempView("topk_in")
    val got = spark.sql(
      "SELECT grp, topk_by_ord(id, score, id, 2) AS top FROM topk_in GROUP BY grp")
      .as[(String, Seq[Long])].head()
    assert(got == (("g", Seq(2L, 3L))))
  }

  test("string tie: byte-wise ascending, survives serialize/merge, matches window") {
    import org.apache.spark.sql.expressions.Window
    // many equal-ord rows force the string tie to decide everything;
    // repartition forces the serialize → shuffle → merge path
    val df = (0 until 3000).map { i =>
      (i % 3, f"term${i % 40}%03d", (i % 5).toDouble) // heavy ord ties
    }.toDF("grp", "term", "score")
      .groupBy($"grp", $"term").agg(sum($"score").as("s"))
      .repartition(8)
    val agg = df.groupBy($"grp")
      .agg(TopK.topKByOrdStrTie($"term", $"s", $"term", 7).as("top"))
      .as[(Int, Seq[String])].collect().toMap
    val win = df.withColumn("rn", row_number().over(
      Window.partitionBy($"grp").orderBy($"s".desc, $"term")))
      .filter($"rn" <= 7).orderBy($"rn")
      .select($"grp", $"term").as[(Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(agg.keySet == win.keySet)
    agg.keySet.foreach(g => assert(agg(g) == win(g), s"group $g: ${agg(g)} vs ${win(g)}"))

    // SQL surface
    df.createOrReplaceTempView("topk_str_in")
    graft.functions.GraftFunctions.register(spark)
    val sqlGot = spark.sql(
      "SELECT grp, topk_by_ord_str(term, s, term, 7) AS top FROM topk_str_in GROUP BY grp")
      .as[(Int, Seq[String])].collect().toMap
    assert(sqlGot == agg)
  }

  test("string payloads survive the serialize/merge path") {
    // 200 groups × 50 rows across partitions forces partial buffers to
    // serialize, shuffle, and merge
    val df = (0 until 10000).map(i =>
      (i % 200, s"p$i", (i * 37 % 1000).toDouble, i.toLong))
      .toDF("grp", "name", "score", "id").repartition(8)
    val got = df.groupBy($"grp")
      .agg(TopK.topKByOrd($"name", $"score", $"id", 5).as("top"))
      .as[(Int, Seq[String])].collect().toMap
    assert(got.size == 200)
    assert(got.values.forall(_.size == 5))
    // spot-check one group against a local computation
    val rows = (0 until 10000).map(i =>
      (i % 200, s"p$i", (i * 37 % 1000).toDouble, i.toLong)).filter(_._1 == 7)
    val expected = rows.sortBy(r => (-r._3, r._4)).take(5).map(_._2)
    assert(got(7) == expected)
  }
}
