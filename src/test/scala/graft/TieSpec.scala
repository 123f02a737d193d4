package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Events, Relational}
import graft.text.TextAnalysis

/** Equal-score tie determinism (round-9 audit): every ranked window in
  * the registry orders by (score, unique-key), so exact ties must
  * resolve identically regardless of input partitioning — a tie that
  * resolved by partition order would flip oracle hashes between runs.
  * Each test feeds an ADVERSARIAL all-ties fixture through several
  * physical layouts and asserts bit-identical output. (The registry
  * sweep itself: tfidf/bm25/rrf rank on score+token|cand, rec on
  * score+neighbor, hough/ellipse on votes|score+component, skyline on
  * a unique (price,size) frontier, anomaly/cusum on unique
  * (type,hour) — this spec pins one family per shape.) */
class TieSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def layouts(df: DataFrame): Seq[DataFrame] =
    Seq(df.repartition(1), df.repartition(13), df.repartition(3, col(df.columns.head)))

  test("tfidf top-k: an all-equal-score doc picks the lexicographically first tokens") {
    // every token appears once in the doc and in exactly 2 of 4 docs
    // -> identical tf, identical df, identical score for all six
    // tokens of doc 0; k=3 must cut purely on the token tie-break
    val docs = Seq(
      (0L, "pear apple mango kiwi lime fig"),
      (1L, "apple mango kiwi"),
      (2L, "pear lime fig"),
      (3L, "plum plum plum")).toDF("doc_id", "text")
    val expected = layouts(docs).map { d =>
      TextAnalysis.tfidfTop(d, k = 3)
        .filter(col("doc_id") === 0L)
        .orderBy("token").collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    }
    assert(expected.forall(_ == expected.head), s"layout-dependent tie: $expected")
    assert(expected.head.map(_._1) == Seq("apple", "fig", "kiwi"),
      s"ties must cut lexicographically: ${expected.head}")
  }

  test("skyline: duplicate frontier points all survive, equal-price ties keep the max size") {
    val dir = java.nio.file.Files.createTempDirectory("tie_part").toString
    // (10.0, 5) twice: mutually non-dominating duplicates, both kept.
    // (10.0, 4): same price, dominated by size 5 -> dropped.
    // (20.0, 9) / (20.0, 9): cheaper-or-equal max is 5 < 9 -> both kept.
    Seq(
      (1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 4),
      (4L, 20.0, 9), (5L, 20.0, 9), (6L, 30.0, 1))
      .toDF("p_partkey", "p_retailprice", "p_size")
      .repartition(5)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = Relational.skyline2d(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got === Set((1L, 10.0, 5), (2L, 10.0, 5), (4L, 20.0, 9), (5L, 20.0, 9)), s"$got")
  }

  test("hourly anomalies: twin types with identical series emit identical rows under any layout") {
    def t(h: Int) = Timestamp.valueOf(f"2026-02-01 $h%02d:30:00")
    // "edge" sits EXACTLY on the threshold: counts (4,4,4,4,24) give
    // the spike z = 2 precisely (k equal lows + 1 spike → z = √k), the
    // case that flipped with float summation order before the
    // round-then-compare fix — it must now be EXCLUDED under every
    // layout. The twins (4,4,4,4,4,24 → z = √5 ≈ 2.236) must trip
    // identically under every layout.
    val rows =
      (for {
        tp <- Seq("alpha", "beta")
        (h, n) <- Seq(0 -> 4, 1 -> 4, 2 -> 4, 3 -> 4, 4 -> 4, 5 -> 24)
        _ <- 0 until n
      } yield (tp, t(h))) ++
      (for {
        (h, n) <- Seq(0 -> 4, 1 -> 4, 2 -> 4, 3 -> 4, 4 -> 24)
        _ <- 0 until n
      } yield ("edge", t(h)))
    val events = rows.toDF("event_type", "ts")
    val results = layouts(events).map { d =>
      Events.hourlyRateAnomalies(d).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3))).toSeq
    }
    assert(results.forall(_ == results.head), s"layout-dependent anomaly: $results")
    assert(!results.head.exists(_._1 == "edge"),
      s"exact-threshold z=2 must round-then-compare out: ${results.head}")
    val zByType = results.head.groupBy(_._1).view.mapValues(_.map(v => (v._3, v._4)).toSet).toMap
    assert(zByType.keySet === Set("alpha", "beta"), s"twins must trip: $zByType")
    assert(zByType("alpha") === zByType("beta"), s"twin series diverged: $zByType")
  }

  test("hard negatives: all-equal-cosine candidates cut on cand_id across layouts") {
    // query 0 (label 0); four IDENTICAL candidate vectors (equal cosine
    // to the query, labels != 0) — top-2 must be the two lowest
    // cand_ids under every physical layout
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0), 0),
      (7L, Seq(0.5, 0.5, 0.0), 1),
      (3L, Seq(0.5, 0.5, 0.0), 2),
      (9L, Seq(0.5, 0.5, 0.0), 1),
      (5L, Seq(0.5, 0.5, 0.0), 2))
      .toDF("vec_id", "vec", "label")
      .select(col("vec_id"), col("vec").cast("array<double>").as("vec"), col("label"))
      .withColumn("norm", graft.similarity.Similarity.l2norm(col("vec")))
    val results = layouts(corpus).map { c =>
      graft.similarity.Similarity.hardNegativesOn(c, benchEvery = 10, hi = 0.9, k = 2)
        .collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    }
    assert(results.forall(_ == results.head), s"layout-dependent tie: $results")
    assert(results.head === Seq((1, 3L), (2, 5L)),
      s"equal cosines must cut on cand_id: ${results.head}")
  }

  test("shard plan positions are layout-invariant (hash order, doc_id tie-break)") {
    // positions come from a window ordered by (hx, doc_id); md5 is
    // injective over these ids so ties cannot occur, but the ORDER must
    // still be layout-independent end to end
    val results = layouts(
        TextAnalysis.pipelineManifest(spark, SparkTestSession.sf0001).select("doc_id")).map { m =>
      m.withColumn("hx", TextAnalysis.shardHash)
        .withColumn("shard", TextAnalysis.shardCol(16))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("shard").orderBy("hx", "doc_id")))
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    }
    assert(results.forall(_ == results.head), s"layout-dependent shard plan")
  }
}
