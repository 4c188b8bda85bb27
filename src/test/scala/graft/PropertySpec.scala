package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** Algebraic properties the shuffle contract guarantees (SURVEY.md §5c):
  * partial+final == direct, permutation invariance, dedup idempotence.
  * Driven by plain scalacheck (no scalatestplus bridge in the offline deps). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rowsGen =
    Gen.listOfN(200, Gen.zip(Gen.choose(0, 9), Gen.choose(-1000L, 1000L)))

  private def check(name: String, prop: Prop, n: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("agg is invariant to partitioning (partial+final == direct)") {
    import spark.implicits._
    check("partition-invariance", Prop.forAll(rowsGen, Gen.choose(1, 13)) {
      (rows, nPart) =>
        val df = rows.toDF("k", "v")
        val direct = df.groupBy("k").agg(sum("v"), count(lit(1)))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        val repart = df.repartition(nPart).groupBy("k").agg(sum("v"), count(lit(1)))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        direct == repart
    })
  }

  test("agg is invariant to row order (permutation invariance)") {
    import spark.implicits._
    check("permutation-invariance", Prop.forAll(rowsGen) { rows =>
      val a = rows.toDF("k", "v").groupBy("k").agg(sum("v"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val b = scala.util.Random.shuffle(rows).toDF("k", "v").groupBy("k").agg(sum("v"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      a == b
    }, n = 5)
  }

  test("join algebra: semi = project of inner, anti = complement of semi") {
    import spark.implicits._
    check("join-algebra", Prop.forAll(rowsGen, rowsGen) { (l, r) =>
      val left = l.toDF("k", "v")
      val right = r.map(_._1).distinct.toDF("k")
      val semi = left.join(right, Seq("k"), "left_semi")
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      val innerProj = left.join(right, Seq("k"))
        .select("k", "v").collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      val anti = left.join(right, Seq("k"), "left_anti")
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      val all = left.collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      semi == innerProj && (semi ++ anti) == all && semi.intersect(anti).isEmpty
    }, n = 5)
  }

  test("dropDuplicates is idempotent and equals distinct on full rows") {
    import spark.implicits._
    check("dedup-idempotence", Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val once = df.dropDuplicates("k", "v")
      once.count() == once.dropDuplicates("k", "v").count() &&
        once.count() == df.distinct().count()
    }, n = 5)
  }
}
