package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Basket-size probe (diagnostic main, round-17 VERDICT item 4): pins
  * the generator fact `rec_user_topn`'s linearity claim rests on —
  * the co-purchase pair join costs C(basket, 2) PER ORDER, so it is
  * linear in orders iff basket size does not grow with the corpus.
  * The probe prints, per scale dir: orders, distinct (order, part)
  * incidence rows, and the mean / p99 / max basket size, plus a time
  * decomposition of the two halves of the query (the bounded k-per-
  * part neighbor model vs the serving aggregation). Results land in
  * BASELINE.md's round-17 section.
  *
  * Run: tools/run_main.sh graft.BasketProbe [dir ...]
  */
object BasketProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale10", "/tmp/graft_scale100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(f"${"dir"}%-28s ${"orders"}%10s ${"incid"}%10s ${"mean_b"}%7s ${"p99_b"}%6s ${"max_b"}%6s ${"nbr_s"}%7s ${"topn_s"}%7s")
    for (d <- dirs) {
      val baskets = Tables(spark, d, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val sizes = baskets.groupBy("o").agg(count(lit(1)).as("b"))
      val r = sizes.agg(count(lit(1)).as("orders"), sum("b").as("incid"),
        avg("b").as("mean"), expr("percentile(b, 0.99)").as("p99"),
        max("b").as("mx")).head()
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // warm EACH half once before timing it (round-18 ADVICE: timing
      // tU cold skewed the nbr/topn decomposition — the cold pass
      // carried first-touch parquet footers + codegen of the serving
      // half, overstating the serving-aggregation share)
      graft.operators.Recommend.itemNeighbors(spark, d)
        .write.format("noop").mode("overwrite").save()
      val tN = time(graft.operators.Recommend.itemNeighbors(spark, d)
        .write.format("noop").mode("overwrite").save())
      graft.operators.Recommend.userTopN(spark, d)
        .write.format("noop").mode("overwrite").save()
      val tU = time(graft.operators.Recommend.userTopN(spark, d)
        .write.format("noop").mode("overwrite").save())
      println(f"$d%-28s ${r.getLong(0)}%10d ${r.getLong(1)}%10d ${r.getDouble(2)}%7.2f ${r.getDouble(3)}%6.1f ${r.getLong(4)}%6d $tN%7.2f $tU%7.2f")
    }
    spark.stop()
  }
}
