package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** One-off probe: recall + candidate volume per LSH config (run with
  * sbt "Test/runMain graft.LshProbe"). */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val all = Similarity.corpus(spark, SparkTestSession.sf0001).cache()
    val exact = Similarity.bruteForceTopKOn(all, 5, 3)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nPlanes <- Seq(3, 4, 5, 6); nTables <- Seq(4, 8, 12)) {
      val approx = Similarity.lshTopKOn(all, 5, 3, nPlanes, nTables, 64)
        .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact intersect approx).size.toDouble / exact.size
      println(f"PROBE planes=$nPlanes tables=$nTables recall=$recall%.2f")
    }
    spark.stop()
  }
}
