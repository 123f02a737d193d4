package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Components, Ellipse}

/** Throwaway diagnostic: dump the ellipse pipeline's intermediate and
  * final rows for the planted scene, timing each stage. */
object EllipseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("ellipse-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      Console.flush()
      r
    }

    val pixels = t("pixels-checkpoint")(Ellipse.syntheticPixels(spark).localCheckpoint())
    val edges = t("edges-checkpoint")(Ellipse.syntheticEdges(spark).localCheckpoint())
    t("edge-counts")(edges.groupBy("img_id").count().orderBy("img_id").show())

    val labeled = t("cc-label")(Components.label(edges.select("img_id", "y", "x"),
      width = Ellipse.SceneW, perImage = true, diagonal = true))
    t("cc-show")(labeled.groupBy("img_id", "component").count()
      .orderBy("img_id", "component").show(30, false))

    val cands = t("fit-build")(Ellipse.fitCandidates(edges, Ellipse.SceneH, Ellipse.SceneW))
    t("fit-show")(cands.orderBy("img_id", "component").show(50, false))

    val out = t("query-build")(Ellipse.bestEllipseQuery(spark))
    t("query-show")(out.show(50, false))
    t("query-dump") {
      out.coalesce(1).write.mode("overwrite").parquet("/tmp/ell_out/ellipse_best_candidate")
      val json = "{\"ellipse_best_candidate\": " +
        com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
          .writeValueAsString(Ellipse.bestEllipseOracleSql) + "}"
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/ell_out/oracle_sql.json"),
        json.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
