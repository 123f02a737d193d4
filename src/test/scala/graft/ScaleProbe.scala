package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale probe (diagnostic main, not a spec): measures how the
  * dedup/ANN spine scales from sf0.1 to a synthesized 10× corpus —
  * near-linear ratios confirm the candidate-generation plans stay
  * O(collisions); superlinear growth flags a hidden quadratic before
  * real scale does. Results land in BASELINE.md's scale-probe table.
  *
  * The 10× corpus derives from sf0.1 by replication with a per-replica
  * perturbation chosen to PRESERVE the dup/near-dup structure rather
  * than multiply it:
  *  - documents: replica k suffixes EVERY token with "·k" and offsets
  *    doc_id by k·N — all shingles and simhash token hashes differ
  *    across replicas, so each replica keeps the original's internal
  *    near-dup pattern without creating cross-replica near-dups.
  *    (Both identical replication AND a single appended token are
  *    superlinear generator artifacts: one appended token leaves the
  *    other shingles shared, so replicas band-collide as a
  *    replicas-wide clique — measured 970× minhash pair growth on
  *    10× data before the per-token suffix.) Shingle-equality
  *    structure is preserved BIT-EXACTLY (minhash pairs 256 → 2559
  *    at 10×); simhash structure only in DISTRIBUTION — its
  *    Hamming-≤8 pair count is a fresh draw of the token-hash process
  *    per replica and is steeply draw-sensitive on the synthetic
  *    vocabulary (measured 20k–200k pairs across the 10 replicas vs
  *    35k base), so simhash probe ratios carry output variance, not
  *    plan superlinearity.
  *  - embeddings: replica k rotates the vector by k positions (norm-
  *    preserving; rotations of the synthetic vectors decorrelate), and
  *    offsets vec_id by k·N.
  *
  * Run: SPARK_GRAFT_SCALE_DIR=/tmp/graft_scale10 sbt
  *        "Test/runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // replica count is the probe's scale axis: 10 for the standing
    // sweeps, 100 for the decade probe (auto-nlist re-listing, band
    // occupancy, and the O(m^1.5) triangle wedge get their first
    // non-overhead-dominated test there)
    val replicas = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPLICAS", "10").toInt
    val bigDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", s"/tmp/graft_scale$replicas")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the 100x generation legs are single long GC-heavy jobs; the
      // default 120s heartbeat window killed the local executor mid
      // lineitem-write when a full GC + co-tenant load stalled the
      // heartbeater (round 16, measured 125s gap)
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    if (!new java.io.File(s"$bigDir/documents.parquet").exists()) {
      val docs = Tables(spark, baseDir, "documents")
      val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
      val reps = spark.range(replicas).select(col("id").as("rep"))
      docs.crossJoin(reps)
        .select(
          (col("doc_id") + col("rep") * nDocs).as("doc_id"),
          // EVERY token carries the replica suffix, not just one
          // appended token: an appended token leaves the other
          // T-n shingles shared, so replicas of one base doc band-
          // collide as a replicas-wide near-dup clique and pair
          // output grows ~replicas^2 — measured 256 → 248,210
          // minhash pairs (970× on 10× data) before this fix, the
          // exact generator artifact the scaladoc promises to avoid.
          // Suffixing every token decorrelates replicas completely
          // (zero shared shingles, simhash signatures re-drawn) while
          // preserving within-replica structure EXACTLY: two docs in
          // the same replica share a shingle iff their base docs did.
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("·"), col("rep"))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/documents.parquet")
      println(s"[probe] generated $replicas x documents at $bigDir")
    }
    // own existence gate (not documents'): a run that died between the
    // two writes would otherwise resume with documents present and
    // silently skip embeddings forever
    if (!new java.io.File(s"$bigDir/embeddings.parquet").exists()) {
      val reps = spark.range(replicas).select(col("id").as("rep"))
      val emb = Tables(spark, baseDir, "embeddings")
      val nVecs = emb.agg(max("vec_id")).head().getLong(0) + 1
      val dims = emb.select(size(col("embedding"))).head().getInt(0)
      emb.crossJoin(reps)
        // rotate by rep MOD dims positions (replicas can exceed the
        // dimension count at the 100x decade): slice ∥ slice,
        // norm-preserving
        .withColumn("rot", pmod(col("rep"), lit(dims)))
        .select(
          (col("vec_id") + col("rep") * nVecs).as("vec_id"),
          concat(
            slice(col("embedding"), col("rot") + lit(1), lit(dims) - col("rot")),
            slice(col("embedding"), lit(1), col("rot"))).as("embedding"),
          col("label"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")
      println(s"[probe] generated $replicas x corpus at $bigDir")
    }
    if (!new java.io.File(s"$bigDir/events.parquet").exists()) {
      // events scale by USER replication (user_id + k·nUsers, same
      // timestamps): per-user event density — the quantity the
      // temporal operators' candidate counts depend on — stays
      // constant, so linear ratios are the correct expectation.
      // Written with raw nanos `ts` (long) exactly like the driver
      // parquet so Tables' nanosAsLong path reads both the same way.
      val evRaw = spark.read.parquet(s"$baseDir/events.parquet")
      val nUsers = evRaw.agg(max("user_id")).head().getLong(0) + 1
      // stride from the base table, like nUsers: a fixed literal stride
      // would silently collide once the base table outgrew it
      val nEvents = evRaw.agg(max("event_id")).head().getLong(0) + 1
      val reps = spark.range(replicas).select(col("id").as("rep"))
      evRaw.crossJoin(reps)
        .select(
          (col("event_id") + col("rep") * nEvents).as("event_id"),
          col("ts"),
          (col("user_id") + col("rep") * nUsers).as("user_id"),
          col("event_type"), col("value"), col("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/events.parquet")
      println(s"[probe] generated $replicas x events at $bigDir")
    }

    if (!new java.io.File(s"$bigDir/lineitem.parquet").exists()) {
      // relational family: replicate the FACT tables (orders+lineitem,
      // consistent o_orderkey/l_orderkey stride) and copy the
      // dimensions verbatim — join fan-out per fact row stays constant,
      // so linear ratios are the correct expectation for scans/joins
      // and sublinear for the dimension-bounded aggregates
      val ordRaw = spark.read.parquet(s"$baseDir/orders.parquet")
      val nOrders = ordRaw.agg(max("o_orderkey")).head().getLong(0) + 1
      val reps = spark.range(replicas).select(col("id").as("rep"))
      ordRaw.crossJoin(reps)
        .select(
          (col("o_orderkey") + col("rep") * nOrders).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/orders.parquet")
      val liRaw = spark.read.parquet(s"$baseDir/lineitem.parquet")
      liRaw.crossJoin(reps)
        .select(Seq((col("l_orderkey") + col("rep") * nOrders).as("l_orderkey")) ++
          liRaw.columns.filterNot(_ == "l_orderkey").map(col): _*)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/lineitem.parquet")
      for (t <- Seq("customer", "supplier", "nation", "region", "part"))
        spark.read.parquet(s"$baseDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$bigDir/$t.parquet")
      println(s"[probe] generated $replicas x relational facts at $bigDir")
    }

    if (!new java.io.File(s"$bigDir/graph10/lineitem.parquet").exists()) {
      // graph family: the main probe dir replicates ORDER keys only, so
      // the distinct part<->supplier edge set (and the co-purchase
      // graph) is unchanged there — a graph probe over it measures
      // nothing. This leg strides ALL THREE keys, growing edges ~10x at
      // constant per-order density, the axis graph cost actually
      // follows.
      val liRaw = spark.read.parquet(s"$baseDir/lineitem.parquet")
      val nOrders = liRaw.agg(max("l_orderkey")).head().getLong(0) + 1
      val nParts = liRaw.agg(max("l_partkey")).head().getLong(0) + 1
      val nSupp = liRaw.agg(max("l_suppkey")).head().getLong(0) + 1
      val reps = spark.range(replicas).select(col("id").as("rep"))
      liRaw.crossJoin(reps)
        .select(Seq(
          (col("l_orderkey") + col("rep") * nOrders).as("l_orderkey"),
          (col("l_partkey") + col("rep") * nParts).as("l_partkey"),
          (col("l_suppkey") + col("rep") * nSupp).as("l_suppkey")) ++
          liRaw.columns.filterNot(Set("l_orderkey", "l_partkey", "l_suppkey")).map(col): _*)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/graph10/lineitem.parquet")
      println(s"[probe] generated $replicas x graph lineitem at $bigDir/graph10")
    }

    if (!new java.io.File(s"$bigDir/part10/part.parquet").exists()) {
      // entity-matching family: replicate part with a digit appended to
      // the LAST name token (not a new " repk" token — that would fold
      // every replica into one giant block and measure a generator
      // artifact, not the operator). Distinct names x10, per-block size
      // constant, no cross-replica pairs (different last words block
      // apart) — the structure-preserving choice, like documents.
      val partRaw = spark.read.parquet(s"$baseDir/part.parquet")
      val nPart = partRaw.agg(max("p_partkey")).head().getLong(0) + 1
      val reps = spark.range(replicas).select(col("id").as("rep"))
      partRaw.crossJoin(reps)
        .select(Seq(
          (col("p_partkey") + col("rep") * nPart).as("p_partkey"),
          concat(col("p_name"), col("rep")).as("p_name")) ++
          partRaw.columns.filterNot(Set("p_partkey", "p_name")).map(col): _*)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$bigDir/part10/part.parquet")
      println(s"[probe] generated $replicas x part at $bigDir/part10")
    }

    val probeQueries = Seq("dedup_minhash_pairs", "dedup_clusters",
      "emb_lsh_topk", "emb_near_dup", "dedup_simhash_pairs", "txt_pack_sequences",
      "emb_ivfpq_topk", "emb_ivfpq_served", "w_sessionize", "j_asof_prior_view",
      "j_range_window_count",
      "funnel_stages", "retention_cohorts", "txt_vocab_oov", "txt_tfidf_top",
      "j_attr_first_touch", "txt_curation_keep", "f9_json_quarantine",
      "q1_pricing_summary", "q4_priority_late", "q6_forecast_revenue",
      "q7_volume_shipping", "q8_market_share", "q19_bounded_or",
      "profile_orders", "cdc_apply", "txt_bpe_merges", "txt_bpe_tokenize",
      "graph_pagerank", "graph_triangles", "skyline_parts",
      "w_ntile_quartiles", "gsets_revenue", "mv_incremental",
      "ts_anomaly_hourly", "w_expanding_zscore", "dedup_fuzzy_names",
      "graph_bfs_hops", "graph_components", "dedup_name_entities",
      "cdc_scd2", "cdc_asof_snapshot", "txt_pmi_bigrams",
      "txt_feature_hash", "dedup_jaccard_prefix",
      // round-8 late additions: the co-purchase family (pair self-join
      // on the order key — per-basket C(k,2) cost, the quadratic-risk
      // shape), LM scoring (bigram model join), container round-trip
      // (map + file IO), and the window/statistics batch
      "rec_item_neighbors", "rec_user_topn", "assoc_rules",
      "txt_lm_perplexity", "warc_roundtrip", "ts_cusum_changepoints",
      "chi2_type_dow", "rfm_segments",
      // session-late additions: graph iteration family (communities,
      // weighted SSSP — per-round join cost tracks edges), hybrid
      // retrieval (two corpus scans + bounded fusion), decontamination
      // exact vs bloom (the pre-filter's win IS the probe delta), and
      // the fixed-cell CMS (the flattest ratio on the board by design)
      "graph_communities", "graph_sssp", "search_hybrid_rrf",
      "txt_decontaminate", "txt_decontaminate_bloom", "sketch_cms_freq",
      // second session batch: lexical scoring (corpus-stats + token
      // join), bounded-state UDAF sketch, restart-pinned PageRank and
      // peeling (per-round edge joins), and the composed manifest
      "search_bm25", "sketch_kmv_agg", "graph_ppr", "graph_kcore",
      "txt_pipeline_manifest",
      // third batch: per-node clustering (wedge join), per-row PIT
      // enrichment (key join + containment filter), and the served
      // sparse/hybrid retrieval paths (index built untimed, see
      // `prebuilt`)
      "graph_clustering", "cdc_pit_enrich", "search_bm25_served",
      "search_hybrid_served",
      // round-9: frontier-relaxation SSSP (per-round join is on the
      // changed set, not the settled set) and the tolerance-exit
      // PageRank/PPR pair (round count is data-driven)
      "graph_sssp_delta", "graph_pagerank_tol", "graph_ppr_tol",
      // round-9 second batch: the PII scrub (pure map — the flattest
      // expected row), DSIR scoring (bucket-bounded side tables +
      // one corpus agg), the semantic-dedup pair (exact audit rung is
      // O(n²) BY CONTRACT vs the LSH production sibling), MMR
      // (bounded per-query work over the exact candidate scan), and
      // quota-diversified retrieval (same scan + two windows)
      "txt_pii_redact", "mix_dsir_weights", "emb_semantic_keep",
      "emb_semantic_keep_lsh", "emb_mmr_rerank", "search_topk_diverse",
      // span masking shares decontaminate's join shape; its islands
      // window runs over hit rows only
      "txt_mask_spans",
      // third session: the deterministic-Lloyd family — clustering is
      // k bounded Lloyd rounds (broadcast assignment scan + integer
      // (cluster,pos) sum shuffle, linear per round); SemDeDup bounds
      // pair work at sum(|cluster|^2) ~ n^2/k, the middle rung between
      // the exact audit quadratic and LSH; ivf_det adds probed-list
      // re-rank on top of the same centroids
      "emb_kmeans_clusters", "emb_semdedup_keep", "emb_ivf_det_topk",
      "emb_semdedup_keep_auto",
      // fourth session: CCNet terciles (ppl relation + config-sized
      // threshold join), temperature weights (config-sized aggregates
      // — expected flat), the histogram quantile sketch (bounded
      // bin-state aggregate), eval screening + hard negatives (both
      // broadcast-eval corpus scans; the stand-in eval side grows with
      // the corpus here, production eval sets don't), and HITS (main
      // dir: the distinct customer->supplier edge set is constant by
      // construction there, so this probes the edge-DERIVATION scan,
      // the linear leg; the bounded rounds run on the fixed edge set)
      "txt_ppl_buckets", "mix_temperature", "sketch_hist_quantiles",
      "emb_decontaminate", "emb_hard_negatives", "graph_hits",
      // KS drift: grouped distinct-value window + broadcast stats
      "ts_ks_drift",
      // per-source boilerplate: one (source, fp) shuffle of 16-byte fps
      "txt_boilerplate",
      // PSI drift: two bounded-bin-state aggregates + a one-row join
      "ts_psi_drift",
      // CEP: one user_id shuffle; per-user string bounded by density
      "cep_pattern_counts",
      // fixed-resolution near-dup: quadratic-in-occupancy BY CONTRACT
      // (the auto sibling emb_near_dup is the production path)
      "emb_near_dup_det",
      // logreg training: steps x (broadcast weight join + two bounded
      // aggregates) — linear per step
      "txt_logreg_scores",
      // t-test: one grouped aggregate + a scalar broadcast — flat
      "stat_source_ttest")
    // queries whose FIRST execution per dir includes a one-time index
    // build (the serving layout's whole point is build-once): pre-run
    // untimed on BOTH dirs so the timed runs measure steady-state
    // serving, not index construction — that cost is emb_ivfpq_topk's
    // row, which re-encodes per run by design
    val prebuilt = Set("emb_ivfpq_served", "mv_incremental",
      "search_bm25_served", "search_hybrid_served")
    // families whose scale axis the main probe dir cannot move (see the
    // graph10/part10 generation comments): probe them against their
    // dedicated 10x dirs instead
    val specialBigDir = Map(
      "graph_pagerank" -> s"$bigDir/graph10",
      "graph_triangles" -> s"$bigDir/graph10",
      "graph_bfs_hops" -> s"$bigDir/graph10",
      "graph_components" -> s"$bigDir/graph10",
      "graph_communities" -> s"$bigDir/graph10",
      "graph_sssp" -> s"$bigDir/graph10",
      "graph_ppr" -> s"$bigDir/graph10",
      "graph_kcore" -> s"$bigDir/graph10",
      "graph_clustering" -> s"$bigDir/graph10",
      "graph_sssp_delta" -> s"$bigDir/graph10",
      "graph_pagerank_tol" -> s"$bigDir/graph10",
      "graph_ppr_tol" -> s"$bigDir/graph10",
      "skyline_parts" -> s"$bigDir/part10",
      "dedup_fuzzy_names" -> s"$bigDir/part10",
      "dedup_name_entities" -> s"$bigDir/part10")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // optional comma-separated filter for probing just-added families
    // without re-measuring the whole history
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = probeQueries.filter(q => only.forall(_.contains(q)))

    // one untimed warmup per query at base scale primes codegen/JIT
    selected.foreach(time(_, baseDir))
    prebuilt.filter(selected.contains).foreach(
      q => time(q, specialBigDir.getOrElse(q, bigDir)))
    val results = selected.map { q =>
      val tBase = time(q, baseDir)
      val tBig = time(q, specialBigDir.getOrElse(q, bigDir))
      (q, tBase, tBig, tBig / tBase)
    }
    println(f"${"query"}%-22s ${"sf0.1_s"}%8s ${s"x${replicas}_s"}%8s ${"ratio"}%7s")
    results.foreach { case (q, a, b, r) =>
      println(f"$q%-22s $a%8.2f $b%8.2f $r%7.2f")
    }
    spark.stop()
  }
}
