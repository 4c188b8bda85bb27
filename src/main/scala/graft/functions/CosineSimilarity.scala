package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float vectors,
  * computed in double precision with a strict sequential fold (index order),
  * so results are deterministic and independent of partitioning.
  *
  * Codegen keeps the hot loop inside whole-stage codegen — no boxing, no
  * Scala closure per row — which is what makes brute-force scoring of
  * ~10^8 candidate pairs/core/second feasible at 100 TB scale (prompt:
  * "a native Catalyst Expression beats a Scala UDF beats anything else").
  * Semantics: similarity over the common prefix length; zero vector → 0.0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      // schema allows null elements (parquet float arrays read as
      // containsNull=true): skip the position on either-side null
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi
      }
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Validation for the size parameters of the sized-codegen functions
  * (minhash_sig rows/bands, simhash_sig width, hyperplane_sig
  * width/probes): these sizes unroll into the generated code, so they
  * MUST be integer literals known at plan time. A bare
  * `eval(null).asInstanceOf[Int]` turned a non-literal, NULL, or
  * long-typed argument into a plan-time ClassCastException/NPE with no
  * user-facing message — this helper instead raises Spark's own
  * NON_FOLDABLE_ARGUMENT analysis error naming the function and
  * parameter, and widens any integral literal that fits in an Int. */
private[graft] object SizedArg {
  import org.apache.spark.sql.AnalysisException

  def literalInt(fn: String, param: String, e: Expression): Int = {
    def bad(): Nothing = throw new AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`",
        "paramType" -> "\"INT\""))
    if (!e.foldable) bad()
    (try e.eval(null) catch { case _: Throwable => bad() }) match {
      case i: Int => i
      case i: Short => i.toInt
      case i: Byte => i.toInt
      case l: Long if l.isValidInt => l.toInt
      case _ => bad() // NULL, fractional, string, or an out-of-range long
    }
  }
}

/** Session-local registration of graft's native functions; idempotent, works
  * on any SparkSession (no spark.sql.extensions config needed, so the
  * driver's own sessions work too). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
    // optional rows/bands must be integer literals (they size the codegen)
    registry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head,
        if (exprs.length > 1) SizedArg.literalInt("minhash_sig", "rows", exprs(1))
        else MinHashSig.DefaultRows,
        if (exprs.length > 2) SizedArg.literalInt("minhash_sig", "bands", exprs(2))
        else MinHashSig.DefaultBands), "built-in")
    registry.createOrReplaceTempFunction(
      "vector_avg", exprs => VectorAvg(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    // optional width must be an integer literal (it sizes the generated code)
    registry.createOrReplaceTempFunction(
      "simhash_sig", exprs => SimHashSig(exprs.head,
        if (exprs.length > 1) SizedArg.literalInt("simhash_sig", "words", exprs(1))
        else SimHashSig.DefaultWords), "built-in")
    // width/probes must be integer literals (they size the generated code)
    registry.createOrReplaceTempFunction(
      "hyperplane_sig", exprs => HyperplaneSig(exprs.head,
        SizedArg.literalInt("hyperplane_sig", "width", exprs(1)),
        SizedArg.literalInt("hyperplane_sig", "probes", exprs(2))), "built-in")
    registry.createOrReplaceTempFunction(
      "bpe_count", exprs => BpeCount(exprs.head), "built-in")
    // dim must be an integer literal (it sizes the output vector)
    registry.createOrReplaceTempFunction(
      "feature_hash_vec", exprs => FeatureHashVec(exprs.head,
        SizedArg.literalInt("feature_hash_vec", "dim", exprs(1))), "built-in")
  }
}
