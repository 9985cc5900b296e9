package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Vector kernels for the embedding surface. */
object VectorPrimitives {
  /** Sequential-fold dot product Σ a[i]·b[i] in ascending index order —
    * EXACTLY the double-addition sequence of the HOF formulation
    * (`aggregate(zip_with(a,b,*), 0.0, +)`) and of the DuckDB oracle's
    * `list_reduce` (acc starts at the first product; 0.0 + p₁ ≡ p₁), so
    * results are bit-identical while skipping the per-row intermediate
    * array the HOF pair allocates.
    */
  def dotSeq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** Sequential-fold dot product (array<double> × array<double> → double).
  * The hot inner operation of every cosine: brute-force is |Q|·N of these,
  * k-means training is k·N per assignment pass. Codegen'd single pass,
  * zero allocation.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorPrimitives.dotSeq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VectorPrimitives.dotSeq($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}
