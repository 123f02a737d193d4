package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Similarity

/** The deterministic-Lloyd contracts behind emb_kmeans_clusters /
  * emb_semdedup_keep / emb_ivf_det_topk: hand-computable clustering on
  * a crafted corpus, partitioning invariance (the engine-exactness
  * claim), argmin fidelity of the assignment idiom, empty-cluster
  * carry, SemDeDup keep parity with the exact audit rung on planted
  * duplicates, and the nProbe=nlist degeneration to brute force. */
class KMeansSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf0001}
  import spark.implicits._

  private def corpusOf(rows: (Long, Seq[Double])*): DataFrame =
    rows.toDF("vec_id", "vec")
      .select(col("vec_id"), col("vec").cast("array<double>").as("vec"))
      .withColumn("norm", Similarity.l2norm(col("vec")))

  test("two planted groups separate at k=2 with strided seeds") {
    // n=6, k=2 -> stride 3: seeds are ranks 0 (vec 0, group A) and 3
    // (vec 3, group B); one Lloyd round then a final assignment must
    // recover the planted grouping exactly.
    val c = corpusOf(
      0L -> Seq(1.0, 0.0), 1L -> Seq(0.9, 0.1), 2L -> Seq(1.1, -0.1),
      3L -> Seq(0.0, 1.0), 4L -> Seq(0.1, 0.9), 5L -> Seq(-0.1, 1.1))
    val got = Similarity.kmeansAssignOn(c, k = 2, iters = 2)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1))
  }

  test("assignment is invariant under input partitioning") {
    val all = Similarity.corpus(spark, sf0001).cache()
    def assignOf(df: DataFrame): Seq[(Long, Int)] =
      Similarity.kmeansAssignOn(df, k = 8, iters = 2)
        .select("vec_id", "cluster_id").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toSeq.sorted
    val base = assignOf(all)
    assert(base === assignOf(all.repartition(13)))
    assert(base === assignOf(all.repartition(1)))
    all.unpersist()
  }

  test("every vector lands on its true argmin centroid (ties to lowest id)") {
    val all = Similarity.corpus(spark, sf0001).cache()
    val cent = Similarity.kmeansCentroidsDet(all, k = 8, iters = 2)
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).toMap
    val micros = all.select(col("vec_id"),
        transform(col("vec"), x => floor(x * lit(1e6) + lit(0.5))).as("mv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val got = Similarity.kmeansAssignOn(all, k = 8, iters = 2)
      .select("vec_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((id, mv) <- micros) {
      val want = cent.toSeq.map { case (cid, cv) =>
        (mv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.min._2
      assert(got(id) === want, s"vec $id assigned ${got(id)}, argmin is $want")
    }
    all.unpersist()
  }

  test("clusters that lose every member keep their previous centroid") {
    // 3 identical vectors, k=3, stride 1: all three seeds coincide, so
    // every row ties to cluster 0; clusters 1 and 2 must survive the
    // update (carried centroids), and the centroid table stays k rows.
    val c = corpusOf(0L -> Seq(1.0, 1.0), 1L -> Seq(1.0, 1.0), 2L -> Seq(1.0, 1.0))
    val cent = Similarity.kmeansCentroidsDet(c, k = 3, iters = 2).collect()
    assert(cent.length === 3)
    assert(cent.map(_.getSeq[Long](1)).distinct.length === 1)
    val assign = Similarity.kmeansAssignOn(c, k = 3, iters = 2)
      .select("cluster_id").collect().map(_.getInt(0)).toSet
    assert(assign === Set(0))
  }

  test("SemDeDup keeps exactly one of each planted duplicate, matching the exact rung") {
    val base = Similarity.corpus(spark, sf0001)
    // plant exact copies of vecs 0 and 1 at high ids: identical micros
    // => identical distances => same cluster, cosine 1.0 edge
    val dups = base.filter(col("vec_id") < 2)
      .withColumn("vec_id", col("vec_id") + lit(1000L))
    val all = base.unionByName(dups).cache()
    val clustered = Similarity.semanticKeepClusteredOn(all, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val exact = Similarity.semanticKeepOn(all, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    for (id <- Seq(0L, 1L)) {
      assert(clustered(1000L + id) === ((id, false)),
        s"planted copy of $id not collapsed: ${clustered(1000L + id)}")
      assert(clustered(1000L + id) === exact(1000L + id))
      assert(clustered(id) === exact(id))
    }
    all.unpersist()
  }

  test("ivfDet with nProbe = nlist degenerates to brute force bit-for-bit") {
    val all = Similarity.corpus(spark, sf0001).cache()
    val brute = Similarity.bruteForceTopKOn(all, nQueries = 5, k = 3).collect().toSeq
    val ivf = Similarity.ivfDetTopKOn(all, nQueries = 5, k = 3,
      nlist = 8, nProbe = 8).collect().toSeq
    assert(ivf === brute)
    all.unpersist()
  }
}
