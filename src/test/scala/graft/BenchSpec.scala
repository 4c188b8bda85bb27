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

  test("parsePriorQueries reads the driver wrapper with escaped truncated tail") {
    // the round driver's BENCH_r*.json: metadata object embedding an
    // escaped fragment of the bench line, cut mid-pair at the front
    val wrapper = """{"n":4,"rc":0,"cpus":32,"sf":0.1,""" +
      """"tail":"54793,\"q_embed_quantize\":0.299,\"q_except_all\":0.412"}"""
    val m = Bench.parsePriorQueries(wrapper)
    assert(m == Map("q_embed_quantize" -> 0.299, "q_except_all" -> 0.412))
  }

  test("parsePriorQueries tolerates malformed input") {
    assert(Bench.parsePriorQueries("").isEmpty)
    assert(Bench.parsePriorQueries("""{"metric":"total"}""").isEmpty)
    assert(Bench.parsePriorQueries("not json at all").isEmpty)
  }

  test("parsePriorQueries reads scientific-notation values (negative exponent)") {
    // Scala Double.toString emits e.g. "5.0E-4" below 1e-3; the charset
    // regex of r5 matched "5.0E" and the toDouble throw dropped the map
    val line = """{"queries":{"q_fast":5.0E-4,"q_big":1.2e+3,"q_plain":2.0}}"""
    val m = Bench.parsePriorQueries(line)
    assert(m == Map("q_fast" -> 5.0e-4, "q_big" -> 1.2e3, "q_plain" -> 2.0))
  }

  test("parsePriorQueries keeps good pairs when one pair is malformed") {
    // a truncation mid-number must cost only that entry, not the whole map
    val line = """"q_ok":1.25,"q_cut":,"q_dot":.5,"q_ok2":0.5"""
    val m = Bench.parsePriorQueries(line)
    assert(m == Map("q_ok" -> 1.25, "q_ok2" -> 0.5))
  }
}
