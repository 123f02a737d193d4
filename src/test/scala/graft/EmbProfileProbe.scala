package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Stage-level decomposition of the cosineNearDupPairsOn pipeline on a
  * scale corpus (round 16): replicates the public pipeline stage by
  * stage and times each with a count() barrier, so the 100× wall time
  * attributes to collapse / bucketing / pairing instead of guesses.
  * Run: Test/runMain graft.EmbProfileProbe <sfDir> */
object EmbProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale100")
    val spark = SparkTestSession.spark
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[emb-profile] $name%-28s ${(System.nanoTime() - s) / 1e9}%8.2f s  -> $r")
      r
    }
    val all = Similarity.corpus(spark, dir)
    t("corpus count")(all.count())
    val others = all.columns.filterNot(_ == "vec_id")
    val reps = all.groupBy(others.map(col).toIndexedSeq: _*)
      .agg(min(col("vec_id")).as("vec_id"))
      .select(all.columns.map(col).toIndexedSeq: _*)
    val repsC = t("collapse reps (groupBy vec)")(reps.localCheckpoint())
    val n = t("reps count")(repsC.count())
    val planes = math.max(4, math.ceil(math.log(math.max(n, 1L) / 32.0) / math.log(2.0)).toInt)
    println(s"[emb-profile] planes=$planes tables=8")
    def fp(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__h1", xxhash64(col("vec")))
      .withColumn("__h2", xxhash64(lit("graft:vec2"), col("vec")))
    t("stars join")(fp(all).select(col("vec_id"), col("__h1"), col("__h2"))
      .join(fp(repsC).select(col("vec_id").as("k"), col("__h1"), col("__h2")),
        Seq("__h1", "__h2"))
      .filter(col("vec_id") =!= col("k")).count())
    val bucketed = repsC.select(col("vec_id"), col("vec"), col("norm"),
      posexplode(array((0 until 8).map(tb =>
        Similarity.lshBucket(col("vec"), tb, planes, 64)): _*)).as(Seq("tbl", "bucket")))
    t("bucket explode")(bucketed.count())
    val grouped = bucketed.groupBy("tbl", "bucket")
      .agg(sort_array(collect_list(
        struct(col("vec_id").as("id"), col("vec").as("v"), col("norm").as("nm")))).as("ms"))
    t("bucket agg (collect_list)")(grouped.count())
    t("occupancy stats")(grouped.select(expr("size(ms)").as("s"))
      .agg(max("s"), expr("percentile(s, 0.99)"), sum(expr("CAST(s AS BIGINT) * s"))).collect()
      .mkString(","))
    val pairs = grouped.select(explode(expr(
      "flatten(transform(ms, (a, i) -> transform(slice(ms, i + 2, size(ms)), " +
        "b -> struct(a.id AS vec_a, b.id AS vec_b, " +
        "graft_dot(a.v, b.v) / (a.nm * b.nm) AS cos))))")).as("p"))
      .select(col("p.vec_a"), col("p.vec_b"), col("p.cos").as("cos"))
    t("pair explode + cosine")(pairs.count())
    t("filter + distinct")(pairs.filter(col("cos") >= 0.3).distinct().count())
    t("full operator")(Similarity.cosineNearDupPairs(spark, dir, threshold = 0.3).count())
  }
}
