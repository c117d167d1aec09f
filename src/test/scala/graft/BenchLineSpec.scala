package graft

import com.fasterxml.jackson.databind.ObjectMapper

import org.scalatest.funsuite.AnyFunSuite

/** The Bench stdout line is the driver's machine-readable gate: it is
  * tail-captured at 2000 chars, so any suite size must render to
  * <= 1900 chars of VALID JSON with the contract keys (rounds 1–4
  * recorded parsed:null when fixed formatting outgrew the budget).
  * This spec renders synthetic suites well past the current query
  * count — growth is caught here, before a driver run breaks the gate.
  */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def check(results: Seq[(String, Double, Boolean)]): Unit = {
    val line = Bench.renderStdoutLine(results, "sf0.1")
    assert(line.length <= 1900, s"line ${line.length} chars: $line")
    val root = mapper.readTree(line) // throws on invalid JSON
    assert(root.path("metric").asText() == "total")
    assert(root.path("unit").asText() == "sec")
    assert(root.path("sf").asText() == "sf0.1")
    assert(root.path("queries").isObject)
    assert(root.path("failed").isArray)
    val okTotal = results.collect { case (_, v, true) => v }.sum
    assert(math.abs(root.path("value").asDouble() - okTotal) < 0.01)
    val shown = root.path("queries").size()
    val omitted = root.path("queries_omitted").asInt(0)
    assert(shown + omitted == results.size,
      s"shown $shown + omitted $omitted != ${results.size}")
    // when entries are dropped, the SLOWEST must survive (grading reads
    // them); verify the max value is still present (tier 5 — a failed
    // array that alone overflows — legitimately empties the map)
    if (omitted > 0 && shown > 0) {
      val maxV = results.map(_._2).max
      val vals = root.path("queries").properties().iterator()
      var found = false
      while (vals.hasNext) {
        if (math.abs(vals.next().getValue.asDouble() - math.round(maxV)) <= 0.5)
          found = true
      }
      assert(found, s"slowest entry ($maxV s) omitted from $line")
    }
  }

  private def synth(n: Int, failEvery: Int = 0): Seq[(String, Double, Boolean)] =
    (1 to n).map { i =>
      // deterministic value spread: many sub-second, a long multi-digit
      // tail (worst-case digit counts), a few hundreds-of-seconds rows
      val v = (i % 7) match {
        case 0 => 120.0 + i % 97
        case 1 => 10.0 + (i % 13)
        case 2 => 0.3 + (i % 10) / 10.0
        case _ => 1.0 + (i % 29) / 3.0
      }
      (s"q${i}_synthetic_operator_name_$i", v, failEvery == 0 || i % failEvery != 0)
    }

  test("360-query suite renders inside the budget") { check(synth(360)) }

  test("500-query suite renders inside the budget") { check(synth(500)) }

  test("current registered suite renders inside the budget") {
    // the real query names with a pessimistic value spread (every row
    // multi-digit); the tiering must keep the line legal no matter how
    // many queries future rounds register
    val names = SparkEntry.queries.keys.toSeq.sorted
    check(names.zipWithIndex.map { case (n, i) => (n, 11.0 + i % 89, true) })
  }

  test("mass-failure run degrades the failed array instead of overflowing") {
    check(synth(400, failEvery = 2))
    check(synth(400, failEvery = 1)) // everything failed
  }
}
