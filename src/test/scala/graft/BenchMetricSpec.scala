package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench driver keeps only the LAST 2000 bytes of stdout and parses the
  * metric JSON line out of that window. BENCH_r04 registered "parsed": null
  * because the full-precision line (1987 bytes) plus sbt's trailing
  * "[success]" line overflowed it. Bench now prints millisecond precision
  * and build.sbt suppresses the success line; this spec pins the remaining
  * headroom so catalog growth can't silently re-truncate the metric.
  */
class BenchMetricSpec extends AnyFunSuite {

  test("metric line fits the driver's 2000-byte stdout tail with headroom") {
    // Worst-case value width at ms precision: "99.999" (6 chars) — any
    // single catalog query past 100 s is itself a red-flag regression
    // (the whole r4 run was 36 s).
    val qs = SparkEntry.queries.keys.map(k => "\"" + k + "\":99.999")
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":99999.999,"unit":"sec","queries":$qs,"sf":"/root/testdata/sf0.1"}"""
    assert(line.length <= 1900,
      s"metric line would be ${line.length} bytes; the driver tail window is " +
        "2000 — shorten query names or split the catalog before adding more")
  }

  test("ms formatting is locale-proof and plain-notation") {
    def sec3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    assert(sec3(0.0001234) == "0.000")
    assert(sec3(31.7) == "31.700")
    assert(!sec3(1e-5).contains("E") && !sec3(1e-5).contains(","))
  }
}
