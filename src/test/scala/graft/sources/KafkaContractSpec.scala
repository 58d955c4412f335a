package graft.sources

import graft.SparkSuite
import graft.streaming.WeatherStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Contract tests for the Kafka I/O surface — the reference's entire I/O is
  * Kafka topics (WeatherHotelsApp.java:49-64), but the offline image ships
  * neither the spark-sql-kafka connector nor kafka-clients, so no broker
  * (embedded or otherwise) can run here. What IS assertable without one:
  *
  *  1. the exact option maps each wrapper hands the provider (the wiring
  *     a misconfiguration would break);
  *  2. the wire→contract projection (BINARY key/value → nullable UTF-8
  *     strings) on a DataFrame with Kafka's exact source schema;
  *  3. that the full wrapper call path executes to provider resolution —
  *     i.e. the only missing piece is the connector jar itself.
  *
  * Probe log (re-checked each round): 2026-08-13 (r9) — no `*kafka*`
  * artifact anywhere in the coursier cache (`find /root/.cache/coursier
  * -iname '*kafka*'` → 0), no ivy cache, none of the 287 jars under
  * /opt/spark/jars is a kafka connector or client. Unchanged from prior
  * rounds (r8 probe identical); a broker-backed round-trip test remains
  * environmentally impossible here.
  */
class KafkaContractSpec extends SparkSuite {
  import spark.implicits._

  test("source/batch/sink option maps carry exactly the configured wiring") {
    assert(WeatherStreams.kafkaSourceOptions("b1:9092,b2:9092", "weather") == Map(
      "kafka.bootstrap.servers" -> "b1:9092,b2:9092",
      "subscribe" -> "weather",
      "startingOffsets" -> "earliest"))
    assert(WeatherStreams.kafkaSourceOptions("b:9092", "t", "latest")
      ("startingOffsets") == "latest")
    assert(WeatherStreams.kafkaSinkOptions("b:9092", "out", "/tmp/ckpt") == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "out",
      "checkpointLocation" -> "/tmp/ckpt"))
    assert(Sources.kafkaBatchOptions("b:9092", "t") == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "t",
      "startingOffsets" -> "earliest",
      "endingOffsets" -> "latest"))
  }

  test("wire projection: Kafka's BINARY key/value become nullable strings") {
    // Kafka source relation schema, verbatim (KafkaRecordToRowConverter)
    val wireSchema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("k1".getBytes("UTF-8"),
        """{"lat":1.0}""".getBytes("UTF-8"), "t", 0, 42L,
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 0),
      // byte-array-serde producers (the reference's hotel topic) send null keys
      org.apache.spark.sql.Row(null, "v2".getBytes("UTF-8"), "t", 1, 7L,
        java.sql.Timestamp.valueOf("2020-01-01 00:00:01"), 0))
    val wire = spark.createDataFrame(rows, wireSchema)

    val got = WeatherStreams.fromKafkaWire(wire)
    assert(got.schema == StructType(Seq(
      StructField("key", StringType),
      StructField("value", StringType))))
    val data = got.as[(Option[String], String)].collect().toSet
    assert(data == Set(Some("k1") -> """{"lat":1.0}""", None -> "v2"))
  }

  test("wrapper call paths execute to provider resolution (connector absent)") {
    // each wrapper must fail ONLY on the missing connector jar — any earlier
    // failure (bad option name, malformed plan) raises something else
    val srcErr = intercept[Exception] {
      WeatherStreams.kafkaSource(spark, "b:9092", "weather")
    }
    assert(srcErr.getMessage.toLowerCase.contains("kafka"),
      s"expected provider-lookup failure, got: ${srcErr.getMessage}")
    val batchErr = intercept[Exception] {
      Sources.kafkaBatch(spark, "b:9092", "weather")
    }
    assert(batchErr.getMessage.toLowerCase.contains("kafka"))

    // the sink builder itself resolves lazily — .start() hits the provider
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val sinkErr = intercept[Exception] {
      WeatherStreams.kafkaSink(mem.toDF().toDF("key", "value"),
        "b:9092", "out", "/tmp/graft-kafka-ckpt").start()
    }
    assert(sinkErr.getMessage.toLowerCase.contains("kafka"))
  }
}
