package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The Bench stdout artifact line is read by the driver from a bounded
  * log tail, so it must (a) stay under its character budget whenever
  * that is possible, (b) parse as one JSON object, and (c) degrade by
  * dropping payload — never by throwing (a crash after target/
  * bench.json is written but before the line prints loses the whole
  * driver-pass artifact). Pins Bench.budgetedLine against the
  * overflow scenarios the real suite can produce (25-phase cc_round
  * breakdowns, 250-query maps). */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper
  private def render(entries: Seq[(String, Double)], extra: String) = {
    val qs = entries.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":12.3,"unit":"sec",$extra"queries":$qs}"""
  }
  private def queries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%03d", (n - i + 1) * 0.5)) // slowest-first

  test("everything fits: full query map + first extra, name-sorted") {
    val line = Bench.budgetedLine(render, queries(5),
      Seq("\"samples\":{\"q001\":[1.0,2.0]},", "\"fallback\":1,"), 1800)
    assert(line.length <= 1800)
    val node = mapper.readTree(line)
    assert(node.get("queries").size() == 5)
    assert(node.has("samples") && !node.has("fallback"))
    assert(node.get("truncated_to_slowest").asInt() == 5)
    val names = node.get("queries").fieldNames()
    val list = Iterator.continually(names).takeWhile(_.hasNext).map(_.next()).toList
    assert(list == list.sorted) // re-sorted by name after slowest-first truncation
  }

  test("oversized first extra falls back to the next, then to none") {
    val huge = "\"min_phases\":{" + (1 to 25).map(i =>
      s""""cc_round$i":0.51""").mkString(",") + "},"
    val line = Bench.budgetedLine(render, queries(3),
      Seq(huge * 10, "\"small\":1,"), 300)
    assert(line.length <= 300)
    val node = mapper.readTree(line)
    assert(!node.has("min_phases") && node.has("small"))
  }

  test("250-query map truncates to the slowest that fit and still parses") {
    val line = Bench.budgetedLine(render, queries(250), Seq(""), 1800)
    assert(line.length <= 1800)
    val node = mapper.readTree(line)
    val kept = node.get("truncated_to_slowest").asInt()
    assert(kept > 0 && kept < 250)
    assert(node.get("queries").size() == kept)
    // truncation keeps the SLOWEST queries (the ones perf review needs)
    assert(node.get("queries").has("q001"))
    assert(!node.get("queries").has("q250"))
  }

  test("budget below even the bare line emits it rather than throwing") {
    val line = Bench.budgetedLine(render, queries(10),
      Seq("\"x\":1,"), 10)
    assert(mapper.readTree(line).get("truncated_to_slowest").asInt() == 0)
  }
}
