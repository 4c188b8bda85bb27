package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** Element-wise mean of an array column (embedding centroid) as a
  * partial-aggregable declarative aggregate.
  *
  * The composable alternative — `posexplode` + `groupBy(key, pos)` +
  * re-collect — multiplies the shuffled row count by the vector dimension
  * (64× here) and needs TWO exchanges. This aggregate carries an
  * O(dim) buffer (running element sum + count) through the standard
  * partial/final split: one exchange, no explosion — at a billion vectors
  * per cell the map side reduces everything to dim doubles per cell.
  *
  * All arithmetic is expression-composed (zip_with/transform), so the
  * buffer update is Catalyst-evaluated — no opaque ImperativeAggregate
  * buffer, and the optimizer sees through the whole pipeline.
  *
  * Null array inputs are skipped, and so is any vector CONTAINING a null
  * element (a partial vector cannot contribute to an element-wise mean —
  * and without the guard the lambda variables would read undefined values
  * for null slots). Returns null for empty groups, array<double>
  * otherwise.
  */
case class VectorAvg(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vector_avg expects array<numeric>, got ${t.simpleString}")
  }

  private lazy val vsum = AttributeReference(
    "vsum", ArrayType(DoubleType, containsNull = false))()
  private lazy val vcnt = AttributeReference("vcnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(vsum, vcnt)

  private def asDouble(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType, containsNull = false))

  private def zipAdd(a: Expression, b: Expression): Expression = {
    val x = NamedLambdaVariable("x", DoubleType, nullable = false)
    val y = NamedLambdaVariable("y", DoubleType, nullable = false)
    ZipWith(a, b, LambdaFunction(Add(x, y), Seq(x, y)))
  }

  /** Skip iff the input is null, carries a null element, OR its length
    * differs from the running buffer's — one predicate guarding both
    * buffer expressions. The length guard matters because ZipWith pads the
    * shorter array with nulls, so a mismatched vector would silently plant
    * null elements inside a containsNull=false buffer (r2 ADVICE): the
    * aggregate's dimension is fixed by the first accepted vector and
    * later mismatches are skipped like null-element vectors. */
  private lazy val skipRow: Expression = {
    val elemType = child.dataType.asInstanceOf[ArrayType].elementType
    val x = NamedLambdaVariable("x", elemType, nullable = true)
    Or(
      Or(IsNull(child), ArrayExists(child, LambdaFunction(IsNull(x), Seq(x)))),
      And(Not(IsNull(vsum)), Not(EqualTo(Size(child), Size(vsum)))))
  }

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, ArrayType(DoubleType, containsNull = false)),
    Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(skipRow, vsum,
      If(IsNull(vsum), asDouble(child), zipAdd(vsum, asDouble(child)))),
    If(skipRow, vcnt, Add(vcnt, Literal(1L))))

  /** Two non-null partials can still disagree on dimension when the input
    * mixes vector lengths across partitions (each partial's dimension is
    * its partition's first accepted vector). That input is ill-defined for
    * an element-wise mean; rather than corrupt the buffer via ZipWith
    * padding, the merge keeps the left partial and drops the right —
    * non-deterministic for ill-formed input, never corrupt. */
  private lazy val mergeMismatch: Expression =
    And(And(Not(IsNull(vsum.left)), Not(IsNull(vsum.right))),
      Not(EqualTo(Size(vsum.left), Size(vsum.right))))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(vsum.right), vsum.left,
      If(IsNull(vsum.left), vsum.right,
        If(mergeMismatch, vsum.left, zipAdd(vsum.left, vsum.right)))),
    If(mergeMismatch, vcnt.left, Add(vcnt.left, vcnt.right)))

  override lazy val evaluateExpression: Expression = {
    val x = NamedLambdaVariable("x", DoubleType, nullable = false)
    If(EqualTo(vcnt, Literal(0L)),
      Literal.create(null, dataType),
      ArrayTransform(vsum,
        LambdaFunction(Divide(x, Cast(vcnt, DoubleType)), Seq(x))))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
