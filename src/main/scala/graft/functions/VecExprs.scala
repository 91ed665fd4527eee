package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The hot kernel of every vector-search operator (SURVEY.md §2.4): the HOF
  * formulation (`zip_with` + `aggregate`) is semantically identical but
  * interpreted — each row pays per-element lambda dispatch + boxing. This
  * expression participates in whole-stage codegen, turning a kNN/similarity
  * join probe into a tight primitive loop. Accumulation is sequential
  * (index 0..n-1) in double precision, so results are bit-identical to the
  * HOF version and to the DuckDB oracle's
  * `list_sum(list_transform(...))` (see VectorFns.duckDot).
  *
  * Inputs must already be `array<double>` — the `dotc` wrapper inserts the
  * cast. Returns null if either input is null; mismatched lengths dot the
  * common prefix (inputs here are fixed-dim embeddings, so this never
  * triggers).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VecExprs {
  /** Column wrapper for [[DotProduct]]; casts both sides to array<double>
    * (the expression reads doubles unconditionally). */
  def dotc(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))
}
