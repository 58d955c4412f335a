package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench driver keeps only the LAST 2000 bytes of stdout and parses the
  * metric JSON line out of that window. BENCH_r04 registered "parsed": null
  * because the full-precision line (1987 bytes) plus sbt's trailing
  * "[success]" line overflowed it. Bench now prints millisecond precision
  * and degrades to a compact slowest-20 line once the full map outgrows the
  * window (the full map always lands in bench_metric.json); this spec pins
  * that whatever is PRINTED fits, at any catalog size.
  */
class BenchMetricSpec extends AnyFunSuite {

  // Worst-case value width at ms precision: "99.999" (6 chars) — any
  // single catalog query past 100 s is itself a red-flag regression
  // (the whole r4 run was 36 s).
  private val worstCase =
    SparkEntry.queries.keys.toSeq.map(k => k -> 99.999)

  test("printed metric line fits the driver's 2000-byte stdout tail") {
    val (printed, full) =
      Bench.metricLine(worstCase, "/root/testdata/sf0.1")
    assert(printed.length <= 1900,
      s"printed metric line is ${printed.length} bytes; the driver tail " +
        "window is 2000 — the compact fallback should have engaged")
    // the file line always carries every query, compact or not
    SparkEntry.queries.keys.foreach(k => assert(full.contains("\"" + k + "\"")))
  }

  test("compact fallback keeps the all-query total and parses as JSON-ish") {
    val many = (1 to 300).map(i => f"q_synthetic_query_name_$i%03d" -> i / 1000.0)
    val (printed, full) = Bench.metricLine(many, "/sf")
    assert(printed.length <= 1900 && full.length > 1900)
    val expected = Bench.sec3(many.map(_._2).sum)
    assert(printed.contains("\"value\":" + expected))
    assert(printed.contains("bench_metric.json"))
    // slowest queries (highest seconds) are the ones shown
    assert(printed.contains("q_synthetic_query_name_300"))
    assert(!printed.contains("q_synthetic_query_name_001\""))
  }

  test("small catalogs print the full map on stdout") {
    val few = Seq("q_a" -> 1.0, "q_b" -> 2.5)
    val (printed, full) = Bench.metricLine(few, "/sf")
    assert(printed == full)
    assert(printed.contains("\"q_b\":2.500") && printed.contains("\"value\":3.500"))
  }

  test("file line records per-query max, retimed, and env; stdout schema unchanged") {
    val few = Seq("q_a" -> 1.0, "q_b" -> 2.5)
    val maxes = Seq("q_a" -> 1.2, "q_b" -> 9.9)
    val env = Seq(("ts_start", "2026-08-13T10:00:00Z"),
      ("load_start", "0.52 0.61 0.70 2/345 6789"),
      ("ts_end", "2026-08-13T10:01:00Z"),
      ("load_end", "1.10 0.75 0.71 1/345 6999"))
    val (printed, full) = Bench.metricLine(few, "/sf", maxes = maxes,
      retimed = Seq("q_b:2.500(prior 0.500)"), env = env)
    assert(!printed.contains("queries_max") && !printed.contains("retimed") &&
      !printed.contains("load_start"),
      "stdout line schema must not grow")
    assert(full.contains("\"queries_max\":{\"q_a\":1.200,\"q_b\":9.900}"))
    assert(full.contains("\"retimed\":[\"q_b:2.500(prior 0.500)\"]"))
    assert(full.contains("\"queries\":{\"q_a\":1.000,\"q_b\":2.500}"))
    // the file line must stay machine-parseable
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(full)
    assert(parsed.path("queries_max").path("q_b").asDouble() == 9.9)
    assert(parsed.path("retimed").get(0).asText().startsWith("q_b:"))
    assert(parsed.path("env").path("load_start").asText().startsWith("0.52"))
    assert(parsed.path("env").path("ts_end").asText() == "2026-08-13T10:01:00Z")
  }

  test("ms formatting is locale-proof and plain-notation") {
    assert(Bench.sec3(0.0001234) == "0.000")
    assert(Bench.sec3(31.7) == "31.700")
    assert(!Bench.sec3(1e-5).contains("E") && !Bench.sec3(1e-5).contains(","))
  }
}
