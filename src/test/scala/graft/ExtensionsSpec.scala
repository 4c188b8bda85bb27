package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

class ExtensionsSpec extends AnyFunSuite {

  /** The config-time extension point and the imperative registrar are two
    * doors to the same function set; read the injected identifiers back
    * via reflection (the buffer is private) to keep them in lockstep. */
  private def injectedNames(ext: SparkSessionExtensions): Set[String] = {
    val f = classOf[SparkSessionExtensions].getDeclaredField("injectedFunctions")
    f.setAccessible(true)
    f.get(ext).asInstanceOf[scala.collection.mutable.Buffer[
        (FunctionIdentifier, _, _)]]
      .map(_._1.funcName).toSet
  }

  test("GraftExtensions injects every native function the registrar offers") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(injectedNames(ext) == Set(
      "cosine_sim", "minhash_sig", "vector_avg", "simhash64",
      "simhash_sig", "hyperplane_sig", "bpe_count"))
  }

  test("injected builders bind and evaluate") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val r = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b)").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // the two newest families resolve through the same path
    val sig = Seq(Tuple1(Seq(7L, 11L))).toDF("hs")
      .selectExpr("size(simhash_sig(hs))", "size(minhash_sig(hs))")
      .head()
    assert(sig.getInt(0) == graft.functions.SimHashSig.DefaultWords)
    assert(sig.getInt(1) == graft.functions.MinHashSig.DefaultBands)
  }
}
