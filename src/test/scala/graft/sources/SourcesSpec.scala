package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.WeatherOps
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSuite {
  import spark.implicits._

  private val weatherJson = Seq(
    """{"avg_tmpr_c":19.8,"avg_tmpr_f":67.7,"lat":39.6467,"lng":-89.8455,"wthr_date":"2017-08-29"}""",
    """{"avg_tmpr_c":16.5,"avg_tmpr_f":61.7,"lat":35.7395,"lng":-78.3249,"wthr_date":"2016-10-31"}""",
    """not json""")

  test("rawLines → parseWeather: the Kafka-value file path end to end") {
    val dir = Files.createTempDirectory("src-raw")
    Files.writeString(dir.resolve("w.jsonl"), weatherJson.mkString("\n"))
    val parsed = WeatherOps.parseWeather(Sources.rawLines(spark, dir.toString))
    val keys = parsed.select("key").as[String].collect().toSet
    assert(keys == Set("dp01_2017-08-29", "dq27_2016-10-31")) // malformed dropped
  }

  test("jsonLines with explicit schema: malformed row → nulls (PERMISSIVE)") {
    val dir = Files.createTempDirectory("src-json")
    Files.writeString(dir.resolve("w.jsonl"), weatherJson.mkString("\n"))
    val df = Sources.jsonLines(spark, dir.toString, WeatherOps.weatherSchema)
    assert(df.count() == 3)
    assert(df.filter($"lat".isNull).count() == 1)
    assert(df.schema("lat").dataType == DoubleType)
  }

  test("csv with explicit schema and header") {
    val dir = Files.createTempDirectory("src-csv")
    Files.writeString(dir.resolve("d.csv"),
      "id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Sources.csv(spark, dir.toString, schema)
    assert(df.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
  }

  test("parquet reader round-trips the fixtures") {
    assert(Sources.parquet(spark, s"$sf0001/customer.parquet").count() == 150)
  }
}
