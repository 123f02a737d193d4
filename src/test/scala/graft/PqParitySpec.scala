package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Similarity

/** Direct parity replay for the two PQ rows that previously leaned on
  * INDIRECT siblings at the gate (round-18 VERDICT item 6):
  * emb_pq_topk and emb_ivfpq_served are approximate/ml-trained by
  * nature (ml-KMeans codebooks are not cross-engine reproducible), so
  * no DuckDB oracle exists — but AT PINNED CODEBOOKS the rest of the
  * pipeline (argmin encode, ADC lookup scoring, cosine normalization,
  * row_number ranking) is fully deterministic. This spec re-derives
  * the expected top-k in plain driver-side Scala — an independent
  * implementation sharing NO expression code with the operators — and
  * asserts row-for-row equality, the emb_ivf_det_topk recipe applied
  * directly to the PQ rows. 500-vector sf0.001 corpus: the driver
  * replay is O(n·dim), test-sized only. */
class PqParitySpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  /** (vec_id, vec, norm) collected — the replay's whole world. */
  private lazy val vecs: Seq[(Long, Array[Double], Double)] = {
    Similarity.corpus(spark, dir)
      .select("vec_id", "vec", "norm").collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Double]](1).toArray, r.getDouble(2)))
      .toSeq.sortBy(_._1)
  }

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  /** argmin with FIRST-min tie-break — array_position(min) semantics. */
  private def argminL2(x: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue; var i = 0
    while (i < cents.length) {
      val d = l2sq(x, cents(i)); if (d < bd) { bd = d; best = i }; i += 1
    }
    best
  }
  /** row_number()-ranked top-k by (cos DESC, candId ASC), rounded like
    * the operators (round(cos, 4) AFTER ranking on the raw double). */
  private def rankTopK(scored: Seq[(Long, Double)], k: Int): Seq[(Int, Long, Double)] =
    scored.sortBy { case (id, cos) => (-cos, id) }.take(k).zipWithIndex
      .map { case ((id, cos), i) =>
        (i + 1, id, BigDecimal(cos).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }

  private def collectTopK(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  test("emb_pq_topk equals a driver-side ADC replay at pinned codebooks") {
    val all = Similarity.corpus(spark, dir)
    val m = 16; val ksub = 16; val nQueries = 5; val k = 3
    val books = Similarity.pqCodebooks(all, m, ksub)
    val dim = vecs.head._2.length
    val sub = dim / m
    // replay: encode every vector, per-query LUTs, ADC score, rank
    val codes = vecs.map { case (id, v, _) =>
      id -> Array.tabulate(m)(j => argminL2(v.slice(j * sub, (j + 1) * sub), books(j).map(_.toArray).toArray))
    }.toMap
    val want = vecs.filter(_._1 < nQueries).flatMap { case (qid, qv, qn) =>
      val lut = Array.tabulate(m, ksub)((j, c) =>
        dot(qv.slice(j * sub, (j + 1) * sub), books(j)(c)))
      val scored = vecs.filter(_._1 != qid).map { case (cid, _, cn) =>
        val adc = (0 until m).map(j => lut(j)(codes(cid)(j))).sum
        (cid, adc / (qn * cn))
      }
      rankTopK(scored, k).map { case (r, cid, cos) => (qid, r, cid, cos) }
    }
    val got = collectTopK(Similarity.pqTopKWith(all, books, nQueries, k))
    assert(got === want)
  }

  test("emb_ivfpq_served equals a driver-side probe+ADC replay at the persisted index artifacts") {
    val nQueries = 5; val k = 3; val nProbe = 8; val m = 16; val ksub = 16
    val got = collectTopK(Similarity.ivfpqServedTopK(spark, dir, nQueries, k, nProbe))
    // pin the FROZEN artifacts the serve actually used (read back from
    // the index side tables — the serving contract's source of truth)
    val prefix = Similarity.ensureIndex(spark, dir)
    val (cent, books) = Similarity.readIndexArtifacts(spark, prefix)
    val dim = vecs.head._2.length
    val sub = dim / m
    // replay: coarse-assign + residual-encode the corpus
    val coded = vecs.map { case (id, v, cn) =>
      val list = argminL2(v, cent)
      val rv = v.indices.map(i => v(i) - cent(list)(i)).toArray
      (id, list, cn,
        Array.tabulate(m)(j => argminL2(rv.slice(j * sub, (j + 1) * sub), books(j).map(_.toArray).toArray)))
    }
    val want = vecs.filter(_._1 < nQueries).flatMap { case (qid, qv, qn) =>
      val lut = Array.tabulate(m, ksub)((j, c) =>
        dot(qv.slice(j * sub, (j + 1) * sub), books(j)(c)))
      // top-nProbe lists by (L2 dist ASC, list_id ASC)
      val probed = cent.indices.map(i => (i, l2sq(qv, cent(i)), dot(qv, cent(i))))
        .sortBy { case (i, d, _) => (d, i) }.take(nProbe)
      val qdotc = probed.map { case (i, _, qc) => i -> qc }.toMap
      val scored = coded.filter { case (cid, list, _, _) =>
        cid != qid && qdotc.contains(list) }
        .map { case (cid, list, cn, cs) =>
          val adc = qdotc(list) + (0 until m).map(j => lut(j)(cs(j))).sum
          (cid, adc / (qn * cn))
        }
      rankTopK(scored, k).map { case (r, cid, cos) => (qid, r, cid, cos) }
    }
    assert(got === want)
  }
}
