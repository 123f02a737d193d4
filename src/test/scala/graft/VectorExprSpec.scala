package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExpressions
import graft.similarity.Similarity

/** The native DotProduct expression must agree exactly with the
  * higher-order-function form (identical left-to-right summation) and
  * honor SQL null semantics. */
class VectorExprSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("graft_dot equals the zip_with/aggregate dot bit-for-bit") {
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.1, -0.2, 0.37, 1e9), Seq(2.5, 3.5, -1.25, 1e-9)),
      (3L, Seq.empty[Double], Seq.empty[Double]))
      .toDF("id", "a", "b")
      .select(col("id"),
        call_function("graft_dot", col("a"), col("b")).as("native"),
        Similarity.dot(col("a"), col("b")).as("hof"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) === r.getDouble(2), s"row ${r.getLong(0)}")
    }
  }

  test("graft_dot is null on null input") {
    VectorExpressions.register(spark)
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(call_function("graft_dot", col("a"), col("b")).as("d"))
    assert(df.collect()(0).isNullAt(0))
  }

  test("graft_dot mirrors HOF semantics on ragged arrays and null elements") {
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)), Seq[Option[Double]](Some(3.0))),
      (2L, Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(3.0), Some(4.0))))
      .toDF("id", "a", "b")
      .select(col("id"),
        call_function("graft_dot", col("a").cast("array<double>"), col("b").cast("array<double>")).as("native"),
        Similarity.dot(col("a").cast("array<double>"), col("b").cast("array<double>")).as("hof"))
    df.collect().foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"row ${r.getLong(0)}: native/hof null mismatch")
      assert(r.isNullAt(1), s"row ${r.getLong(0)}: expected NULL")
    }
  }

  test("registration is idempotent") {
    VectorExpressions.register(spark)
    VectorExpressions.register(spark)
    assert(spark.sql("SELECT 1").count() === 1)
  }
}
