package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).appName("pqprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val all = graft.similarity.Similarity.corpus(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")).cache()
    val (m, sub, ksub) = (16, 4, 16)
    val books = (0 until m).map { j =>
      val feat = all.select(array_to_vector(slice(col("vec"), j * sub + 1, sub)).as("features"))
      new KMeans().setK(ksub).setSeed(j.toLong).setFeaturesCol("features").fit(feat).clusterCenters.map(_.toArray)
    }
    def bookCol(j: Int) = array(books(j).map(c => array(c.map(lit): _*)): _*)
    val l2sq = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)
    val coded = (0 until m).foldLeft(all) { (df, j) =>
      val dists = transform(bookCol(j), c => l2sq(slice(col("vec"), j * sub + 1, sub), c))
      df.withColumn(s"code$j", (array_position(dists, array_min(dists)) - 1).cast("int"))
    }
    // reconstruction error: ||x - x̂||² / ||x||²
    val recon = (0 until m).foldLeft(coded) { (df, j) =>
      df.withColumn(s"r$j", element_at(bookCol(j), col(s"code$j") + 1))
    }.withColumn("rvec", concat((0 until m).map(j => col(s"r$j")): _*))
      .withColumn("err", l2sq(col("vec"), col("rvec")))
      .withColumn("n2", l2sq(col("vec"), array_repeat(lit(0.0), 64)))
    recon.select(avg(col("err") / col("n2")).as("rel_err"),
      avg(col("err")).as("abs_err")).show()
    // code distribution for subspace 0
    recon.groupBy("code0").count().orderBy("code0").show(20)
    spark.stop()
  }
}
