package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DotProduct

/** The extension entry point must install cleanly, and the expression
  * it injects must evaluate correctly through the catalyst interfaces
  * (interpreted path; the codegen path is covered by VectorExprSpec
  * through real queries). A session built with
  * spark.sql.extensions=graft.GraftExtensions gets graft_dot in SQL
  * text; the shared test JVM can't rebuild its session, so injection is
  * exercised against a fresh SparkSessionExtensions instance. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs its function injection without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // would throw on a malformed injection
  }

  test("DotProduct evaluates through the interpreted expression path") {
    def arr(xs: Double*) = Literal.create(ArrayData.toArrayData(xs.toArray),
      ArrayType(DoubleType))
    val e = DotProduct(arr(1.0, 2.0, 3.0), arr(4.0, 5.0, 6.0))
    assert(e.checkInputDataTypes().isSuccess)
    assert(e.eval(null) === 32.0)
    val withNull = DotProduct(arr(1.0), Literal.create(null, ArrayType(DoubleType)))
    assert(withNull.eval(null) === null)
  }
}
