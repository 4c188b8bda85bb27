package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench measurement-integrity plumbing: the prior-artifact parser that
  * drives the outlier re-measure pass (r3/r4 both recorded >3x phantom
  * readings from transient host contention; see Bench scaladoc). */
class BenchSpec extends AnyFunSuite {
  test("parsePriorQueries extracts the per-query seconds map") {
    val line = """{"metric":"total","value":43.0,"unit":"sec",""" +
      """"queries":{"q_a":1.5,"q_b":-1.0,"q_c":0.123},"sf":"/x"}"""
    val m = Bench.parsePriorQueries(line)
    assert(m == Map("q_a" -> 1.5, "q_b" -> -1.0, "q_c" -> 0.123))
  }

  test("parsePriorQueries tolerates malformed input") {
    assert(Bench.parsePriorQueries("").isEmpty)
    assert(Bench.parsePriorQueries("""{"metric":"total"}""").isEmpty)
    assert(Bench.parsePriorQueries("not json at all").isEmpty)
  }
}
