package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Similarity
import graft.streaming.StreamKmeans

/** Streaming cluster assignment against the frozen deterministic
  * centroids must be bit-identical to the batch Lloyd assignment for
  * every vector, under any micro-batch slicing — stateless by
  * construction, so slicing can change nothing. */
class StreamKmeansSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  test("streamed assignments == batch kmeansAssignOn across micro-batch slicings") {
    val all = Similarity.corpus(spark, sf0001).cache()
    val cent = StreamKmeans.freeze(Similarity.kmeansCentroidsDet(all, k = 8, iters = 2))
    assert(cent.length === 8)
    val batch = Similarity.kmeansAssignOn(all, k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = all.select("vec_id", "vec").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    all.unpersist()
    for (nSlices <- Seq(1, 3)) {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, Seq[Double])]
      val out = StreamKmeans.assignStream(
        stream.toDF().toDF("vec_id", "vec"), cent)
      val name = s"kmeans_out_$nSlices"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        rows.grouped(math.max(1, rows.length / nSlices)).foreach { b =>
          stream.addData(b.toSeq); q.processAllAvailable()
        }
      } finally q.stop()
      val got = spark.table(name).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cluster_id")).toMap
      assert(got === batch, s"slicing x$nSlices diverged from batch assignment")
    }
  }

  test("tie vectors route to the lowest cluster id, like the batch argmin") {
    // two identical centroids: every vector ties; least(struct) must
    // pick cluster 0, matching min(struct) batch semantics
    val cv = Array.fill(4)(1000000L)
    val cent = Seq(0 -> cv, 1 -> cv)
    val got = Seq((7L, Seq(1.0, 1.0, 1.0, 1.0)))
      .toDF("vec_id", "vec")
      .select(StreamKmeans.assignExpr(col("vec"), cent).getField("cluster_id").as("c"))
      .head().getAs[Int]("c")
    assert(got === 0)
  }
}
