package graft

import org.apache.spark.sql.functions._
import graft.operators.HMRF

/** One-off probe for HMRF convergence behavior (sbt "Test/runMain graft.HmrfProbe"). */
object HmrfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val voxels = HMRF.phantom(spark).cache()
    println("PROBE true counts: " + voxels.groupBy("true_label").count().orderBy("true_label")
      .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    println("PROBE intensity range: " + voxels.agg(min("intensity"), max("intensity")).collect()(0))
    val (labels, params) = HMRF.kmeansInit(voxels)
    println("PROBE kmeans params: " + params.map { case (m, v) => f"($m%.4f, $v%.5f)" }.mkString(" "))
    println("PROBE kmeans counts: " + labels.groupBy("label").count().orderBy("label")
      .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    var p = params
    for (it <- 1 to 4) {
      val updated = HMRF.jacobiUpdate(voxels, p, beta = 1.2)
      val (relab, np) = HMRF.mStep(updated, 3)
      p = np
      println(s"PROBE iter $it params: " + p.map { case (m, v) => f"($m%.4f, $v%.5f)" }.mkString(" ")
        + " counts: " + relab.groupBy("label").count().orderBy("label")
        .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    }
    spark.stop()
  }
}
