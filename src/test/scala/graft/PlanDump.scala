package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    if (args.length > 2 && args(2) == "final") {
      // execute THIS df's own queryExecution (write would clone it) so
      // AQE finalizes stages — runtime exchange/stage reuse is only
      // visible in the final adaptive plan
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    } else println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
