package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Salted-join straggler probe (round-11, VERDICT item 4): the Zipf
  * battery showed the SHIPPED plans absorb skew, so
  * `SkewJoin.saltedJoin` had never been measured in the one regime it
  * exists for — a hot key on a SHUFFLED equality join's fact side
  * (SMJ, broadcast disabled: the dim side too big to broadcast at
  * cluster scale). This probe builds that fixture from the 10× skew
  * corpus: events with the hot-user share AMPLIFIED to ~30% of all
  * rows (the bot-traffic / null-sentinel shape where one shuffle
  * partition holds 10× its peers), joined to the customer relation on
  * user_id, AQE skew handling off so the raw straggler is visible
  * (and separately AQE on, since salting must coexist with it).
  *
  * Run (after ScaleProbe + SkewProbe):
  *   sbt "Test/runMain graft.SaltProbe"
  * Prints an unsalted-vs-salted table; numbers land in BASELINE.md.
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val skewDir = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "/tmp/graft_skew10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(new java.io.File(s"$skewDir/events.parquet").exists(),
      s"skew corpus missing at $skewDir — run ScaleProbe + SkewProbe first")

    // fact: 10x events replicated xREP (default 10 -> 10M rows) with
    // ~30% of rows forced onto user 0 (amplify the corpus's 1.2% hot
    // user into a true straggler key: one SMJ task sorts ~3M rows
    // while its peers sort ~220k). Replica id folds into the salt
    // source so rows stay distinct; hashing is deterministic so every
    // run probes the same rows.
    val rep = sys.env.getOrElse("SPARK_GRAFT_SALT_REP", "10").toInt
    val fact = graft.Tables(spark, skewDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .withColumn("rep", explode(sequence(lit(0), lit(rep - 1))))
      .withColumn("event_id", col("event_id") * rep + col("rep"))
      .drop("rep")
      .withColumn("user_id",
        when(substring(md5(concat(lit("salt-probe:"), col("event_id"))), 1, 2) < "4d",
          lit(0L)).otherwise(col("user_id")))
      .repartition(32)
      .localCheckpoint()
    val total = fact.count()
    val hot = fact.filter(col("user_id") === 0L).count()
    // dim: customers keyed as user ids — modest cardinality, the
    // replicate-per-salt side
    val dim = graft.Tables(spark, skewDir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      .localCheckpoint()
    println(f"[salt] fact=$total%d rows, hot user 0 holds $hot%d (${100.0 * hot / total}%.1f%%), dim=${dim.count()}%d")

    def run(salts: Int): Long = {
      val joined =
        if (salts <= 1) fact.join(dim, Seq("user_id"))
        else graft.operators.SkewJoin.saltedJoin(fact, dim, "user_id", salts,
          saltSrc = col("event_id"))
      joined.select(count(lit(1))).head().getLong(0)
    }
    def timeIt(salts: Int): Double = {
      val t0 = System.nanoTime(); run(salts); (System.nanoTime() - t0) / 1e9
    }
    def medianOf(salts: Int, reps: Int = 3): Double = {
      timeIt(salts)
      val xs = (1 to reps).map(_ => timeIt(salts)).sorted
      xs(xs.size / 2)
    }

    val expect = run(1)
    for (aqe <- Seq(false, true)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      println(f"${"config"}%-14s ${"salts"}%5s ${"sec"}%8s ${"rows_ok"}%8s")
      for (salts <- Seq(1, 8, 32)) {
        val ok = run(salts) == expect
        val t = medianOf(salts)
        println(f"${if (aqe) "aqe-on" else "aqe-off"}%-14s $salts%5d $t%8.2f $ok%8s")
        require(ok, s"salted join (salts=$salts) changed the row count")
      }
    }
    spark.stop()
  }
}
