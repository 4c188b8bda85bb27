package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

class ExtensionsSpec extends AnyFunSuite {

  import org.apache.spark.sql.catalyst.expressions.Expression

  /** The config-time extension point and the imperative registrar are two
    * doors to the same function set; read the injected (name → builder)
    * map back via reflection to keep them in lockstep. The ONE place
    * that touches the private Spark field — both tests go through it, so
    * a Spark upgrade renaming the buffer breaks a single helper. */
  private def injectedBuilders(
      ext: SparkSessionExtensions): Map[String, Seq[Expression] => Expression] = {
    val f = classOf[SparkSessionExtensions].getDeclaredField("injectedFunctions")
    f.setAccessible(true)
    f.get(ext).asInstanceOf[scala.collection.mutable.Buffer[
        (FunctionIdentifier, _, Seq[Expression] => Expression)]]
      .map(t => t._1.funcName -> t._3).toMap
  }

  test("GraftExtensions injects every native function the registrar offers") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(injectedBuilders(ext).keySet == Set(
      "cosine_sim", "minhash_sig", "vector_avg", "simhash64",
      "simhash_sig", "hyperplane_sig", "bpe_count", "feature_hash_vec"))
  }

  test("injected builders honor optional width arguments (full arity)") {
    // name-set equality alone let a builder-arity divergence ship once:
    // the extension's minhash_sig dropped its optional (rows, bands)
    // arguments while the registrar honored them — signatures silently
    // differed between config-time and imperative sessions. Evaluate the
    // INJECTED builders directly at max arity.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val builders = injectedBuilders(ext)
    val hs = Literal.create(Seq(7L, 11L, 13L), ArrayType(LongType))
    val mh = builders("minhash_sig")(Seq(hs, Literal(2), Literal(16)))
      .eval(null).asInstanceOf[ArrayData]
    assert(mh.numElements() == 16, "minhash_sig dropped its bands argument")
    val sh = builders("simhash_sig")(Seq(hs, Literal(13)))
      .eval(null).asInstanceOf[ArrayData]
    assert(sh.numElements() == 13, "simhash_sig dropped its width argument")
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

  test("sized-codegen size args: integral literals widen, bad args raise a named error") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(7L, 11L, 13L))).toDF("doc_id", "hs")
    // a LONG literal used to throw a bare ClassCastException at plan time;
    // it now widens like any integral literal that fits an Int
    assert(df.selectExpr("size(minhash_sig(hs, 6L))").head().getInt(0) ==
      graft.functions.MinHashSig.DefaultBands)
    assert(df.selectExpr("size(simhash_sig(hs, CAST(9 AS SHORT)))")
      .head().getInt(0) == 9)
    // non-foldable, NULL, and fractional arguments raise an
    // AnalysisException naming the function and parameter
    for (bad <- Seq("minhash_sig(hs, CAST(doc_id AS INT))",
        "simhash_sig(hs, NULL)", "minhash_sig(hs, 1.5)",
        "feature_hash_vec(array('a'), CAST(doc_id AS INT))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.selectExpr(bad).collect()
      }
      val fn = bad.takeWhile(_ != '(')
      assert(e.getMessage.contains(fn) &&
        e.getMessage.contains("NON_FOLDABLE_ARGUMENT"),
        s"$bad -> ${e.getMessage}")
    }
  }
}
