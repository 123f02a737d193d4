package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the similarity hot loop (SURVEY §4.3:
  * custom codegen `Expression` as the perf tier above higher-order
  * functions). `zip_with(a, b, *) |> aggregate(+)` materializes an
  * intermediate array per row-pair and walks it twice; this fuses the
  * multiply-accumulate into one codegen'd loop over the two ArrayData
  * buffers — no allocation, stays inside WholeStageCodegen.
  *
  * Registered as the SQL function `graft_dot` on the session's function
  * registry (idempotent), so plans keep a declarative form and the
  * DuckDB oracle keeps matching (`list_dot_product` computes the same
  * left-to-right sum). */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Null semantics mirror the HOF form `aggregate(zip_with(a,b,*),0D,+)`
  // exactly: ragged lengths (zip_with pads with null) or any null
  // element poison the accumulator, so the result is NULL — never a
  // silently-truncated finite number.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = 0.0;
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    ${ev.value} += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Idempotently register `graft_dot` on this session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier("graft_dot")
    if (!registry.functionExists(ident)) {
      registry.createOrReplaceTempFunction("graft_dot",
        (children: Seq[Expression]) => DotProduct(children.head, children(1)),
        "built-in")
    }
  }
}
