package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts for the 100-TB posture: filters reach the
  * parquet scans, projections prune the read schema, fixed-cardinality
  * dimensions broadcast, and no relational query degenerates into a
  * cartesian product. These assert on the planned (pre-execution)
  * string, so a plan regression fails fast without running the query. */
class PlanContractSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filtered scan pushes its predicates into the parquet scan") {
    val p = plan("s3_filtered_scan")
    // plan toString truncates long filter lists with "…", so assert on
    // the named predicates rather than a closed bracket
    assert(p.contains("PushedFilters: [IsNotNull"), "scan must push filters")
    assert(p.contains("EqualTo(o_orderstatus,F)"),
      "the status equality must reach the parquet reader")
  }

  test("point lookup prunes to the selected columns at the scan") {
    val p = plan("s2_point_lookup")
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("c_custkey") && read.contains("c_name"), read)
    assert(!read.contains("c_acctbal") && !read.contains("c_comment"),
      s"unused columns must be pruned: $read")
  }

  test("fixed-cardinality dimensions broadcast in q5") {
    val p = plan("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "region/nation joins must broadcast")
  }

  test("relational queries plan no cartesian products") {
    // emb_knn_cosine (broadcast brute-force baseline) and the synthetic
    // scene queries are exempt by design; everything table-driven that
    // joins on keys must stay hash/merge-join shaped
    // w_gapfill_hours is exempt: its spine × types cross join is
    // deliberately bounded by time range and type cardinality
    val names = Seq("q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
      "q10_returned_revenue", "j_semi_join", "j_outer_join", "j1_frequent_pairs",
      "s5_update_rewrite", "s6_anti_join", "w_running_spend", "set_ops",
      "dedup_minhash_pairs", "dedup_simhash_pairs", "dedup_ngram_jaccard",
      "emb_near_dup", "emb_ivfpq_topk", "st2_events_per_hour", "f9_json_props",
      "funnel_stages", "retention_cohorts", "cdc_apply",
      "txt_vocab_oov", "txt_tfidf_top", "w_sliding_counts")
    names.foreach { n =>
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian product")
    }
  }

  test("q6 is a pure pushed-down scan-aggregate: no join, predicates at the reader") {
    val p = plan("q6_forecast_revenue")
    assert(!p.contains("Join"), "q6 must plan no join")
    assert(p.contains("PushedFilters: [IsNotNull"), "q6 predicates must push")
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"),
      s"q6 must prune to the 4 touched columns: $read")
  }

  test("q4 EXISTS plans as a semi join, never a row-duplicating inner join") {
    val p = plan("q4_priority_late")
    assert(p.contains("LeftSemi"), s"q4 must stay a semi join:\n$p")
  }

  test("q19 bounded-OR reaches the part scan as a pushed Or filter") {
    val p = plan("q19_bounded_or")
    assert(p.contains("Or(EqualTo(p_brand,Brand#1)") || p.contains("Or(And(EqualTo(p_brand"),
      "the brand/size disjunction must push into the part scan")
  }

  test("new decision-support queries plan no cartesian products") {
    Seq("q4_priority_late", "q6_forecast_revenue", "q7_volume_shipping",
      "q8_market_share", "q14_promo_revenue", "q19_bounded_or", "profile_orders")
      .foreach { n =>
        assert(!plan(n).contains("CartesianProduct"), s"$n plans a cartesian product")
      }
  }

  test("q13/q15/q17/q18/q22 plan no cartesian products") {
    Seq("q13_order_distribution", "q15_top_supplier", "q17_small_qty_revenue",
      "q18_large_volume_cust", "q22_wealthy_inactive")
      .foreach { n =>
        assert(!plan(n).contains("CartesianProduct"), s"$n plans a cartesian product")
      }
  }

  test("q13 keeps the priority predicate inside the outer join") {
    // a post-join filter would silently turn the left join inner and
    // drop zero-order customers from the distribution
    val p = plan("q13_order_distribution")
    assert(p.contains("LeftOuter"), s"q13 must stay a left outer join:\n$p")
  }

  test("q15 scalar max broadcasts — no single-partition window") {
    val p = plan("q15_top_supplier")
    assert(p.contains("BroadcastExchange"), "the 1-row max must broadcast")
    assert(!p.contains("Window"),
      "q15 must not plan an empty-partitionBy window (single-task at scale)")
  }

  test("q18 HAVING subquery prunes orders via a semi join") {
    val p = plan("q18_large_volume_cust")
    assert(p.contains("LeftSemi"), s"q18 must semi-join the qualifying orders:\n$p")
  }

  test("q22 NOT EXISTS plans as an anti join with the urgent filter pushed") {
    val p = plan("q22_wealthy_inactive")
    assert(p.contains("LeftAnti"), s"q22 must stay an anti join:\n$p")
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"),
      "the priority filter must reach the orders scan, not run post-join")
  }

  test("dedup candidate generation joins on band keys, not payloads") {
    val p = plan("dedup_minhash_pairs")
    // the self-join must be an equality join (SortMergeJoin or
    // BroadcastHashJoin at this sf), never a nested loop over documents
    assert(!p.contains("BroadcastNestedLoopJoin"), "band join degenerated to NL")
  }

  test("ellipse shape selection carries no per-image literal lists") {
    // r7 de-literalization contract: the early-exit gating must be a
    // join against the strong-circle relation, never collect()+isin —
    // an isin over N images would appear as an In/INSET predicate and
    // grow the plan itself with the corpus
    import org.apache.spark.sql.functions.col
    val edges = operators.Ellipse.syntheticEdges(spark)
    val pixels = operators.Ellipse.syntheticPixels(spark)
    val body = pixels.filter(col("v") >= 100)
    val p = operators.Ellipse.chooseBestShape(edges, pixels, body,
      operators.Ellipse.SceneH, operators.Ellipse.SceneW,
      radii = Seq(12), voteThresh = 40L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("INSET") && !p.contains(" IN ("),
      "per-image gating must be relational (anti-join), not literal lists")
  }

  test("multi-block simhash banding stays an equality join at every block count") {
    // the r7 resolution fix must not change plan shape: wider composite
    // band keys (blocks=5/6) still join by hash/merge on
    // (band_idx, band_key), never by nested loop or cartesian
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x y z")).toDF("doc_id", "text")
    for (m <- Seq(4, 6)) {
      val p = dedup.Dedup.simhashPairs(docs, blocks = m)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"blocks=$m band join degenerated")
    }
  }

  test("PQ ADC scoring broadcasts the per-query lookup tables") {
    val p = plan("emb_pq_topk")
    // the codes × LUT cross join must broadcast the (tiny) LUT side; a
    // shuffled cross join over the code table would be the scale bug
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "ADC join must broadcast the per-query LUTs")
    assert(!p.contains("CartesianProduct"), "ADC join degenerated to a shuffled cartesian")
  }

  test("interval join generates candidates by equality keys, never a range loop") {
    val p = plan("j_range_window_count")
    // the (user, time-bucket) equality must carry the join; a pure
    // range-predicate join would plan BroadcastNestedLoopJoin /
    // CartesianProduct and go O(n^2) at scale
    assert(!p.contains("CartesianProduct"), "interval join degenerated to a cartesian")
    assert(!p.contains("BroadcastNestedLoopJoin"), "interval join degenerated to NL")
  }

  test("as-of join plans as one sort per key side — no join operator at all") {
    val p = plan("j_asof_prior_view")
    assert(!p.contains("Join"), s"as-of should be the single-sort pattern, got a join:\n$p")
    assert(p.contains("Window"), "as-of must run as a window over the tagged union")
  }

  test("sessionize shuffles once on the session key") {
    val p = plan("w_sessionize")
    // one exchange for the user_id grouping (plus the final orderBy's
    // range exchange); session merging itself must not add shuffles
    val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r
      .findAllIn(p).size
    assert(exchanges <= 2, s"sessionize should shuffle once + final sort, got $exchanges:\n$p")
  }

  test("user_id-bucketed events layout: the temporal family goes zero-exchange on user_id") {
    // The events spine (sessionize / as-of / interval counts /
    // attribution) shuffles on user_id per query when reading plain
    // parquet. Written ONCE bucketed by user_id (the proven band-index
    // move), the catalog scan reports hash partitioning and every
    // user-keyed window/join/aggregate plans with NO user_id exchange
    // — the 100-TB layout contract for this table.
    import graft.operators.Temporal
    val table = "graft_events_bucketed_fixture"
    if (!spark.catalog.tableExists(table)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
      graft.sources.Bucketed.writeBucketed(
        Tables(spark, sf, "events"), table, "user_id", 8)
    }
    val ev = spark.table(table)
    val plans = Map(
      "sessionize" -> Temporal.sessionize(ev),
      "asof" -> Temporal.asofPriorEvent(ev, "purchase", "view"),
      "interval" -> Temporal.windowedCount(ev, "purchase", "click", 3600L),
      "first_touch" -> Temporal.firstTouch(ev, "purchase", "view"))
      .view.mapValues(_.queryExecution.executedPlan.toString)
    for ((name, p) <- plans) {
      assert(!"hashpartitioning\\(user_id".r.findFirstIn(p).isDefined,
        s"$name must not re-shuffle bucketed events on user_id:\n$p")
      assert(p.contains("Bucketed: true"), s"$name must use the bucketed scan:\n$p")
    }
    // parity: the bucketed layout changes the PLAN, never the rows
    val plain = Temporal.sessionize(Tables(spark, sf, "events"))
      .orderBy("user_id", "session_start").collect().toSeq
    val bucketed = Temporal.sessionize(ev)
      .orderBy("user_id", "session_start").collect().toSeq
    assert(bucketed === plain, "bucketed layout altered sessionize rows")
  }

  test("bucketed edge layout: the Pregel round join reads edges with zero exchange") {
    // Round-10 layout contract (VERDICT item 1): the graph family's
    // edge relations are written ONCE per (dir, content) bucketed by
    // the per-round join key. Under the scale plan (SMJ — what a graph
    // whose node state outgrows broadcast gets), the edge side must
    // come straight off the bucketed scan with NO hashpartitioning(a)
    // exchange; only the node-state side moves.
    import org.apache.spark.sql.functions._
    val linked = graft.operators.Graph.linkedEdges(spark, sf)
    val pr = linked.select(col("a").as("node")).distinct()
      .withColumn("pr", lit(1.0))
    val round = linked.hint("merge").join(pr, linked("a") === pr("node"))
      .groupBy(col("b")).agg(sum(col("pr") / col("deg")).as("pr"))
    val p = round.queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), s"round join must use the bucketed scan:\n$p")
    assert(!"Exchange hashpartitioning\\(a#".r.findFirstIn(p).isDefined,
      s"edge side must not re-shuffle on the node key:\n$p")
    // parity: the layout changes the PLAN, never the rows — table
    // contents equal the freshly derived relation
    val base = Tables(spark, sf, "lineitem")
      .select(concat(lit("p:"), col("l_partkey")).as("a"),
        concat(lit("s:"), col("l_suppkey")).as("b"))
      .distinct()
    val edges = base.union(base.select(col("b").as("a"), col("a").as("b")))
    val fresh = edges.join(edges.groupBy("a").agg(count(lit(1)).as("deg")), "a")
      .select("a", "b", "deg")
      .orderBy("a", "b").collect().toSeq
    val stored = linked.orderBy("a", "b").collect().toSeq
    assert(stored === fresh, "bucketed edge table diverged from the derived relation")
  }

  test("pregel state side is data-driven: broadcast below the row budget, bucketed SMJ above") {
    // Round-11 contract (VERDICT item 1): the per-round edges⋈state
    // join gates its broadcast(state) hint on the driver-side node
    // count. Below `graft.graph.stateBroadcastMaxRows` the DEFAULT
    // (unhinted by the caller) plan must broadcast the STATE side —
    // the planner's stats would otherwise broadcast the edge table
    // (small file stats vs stat-less checkpointed state), the
    // measured-slowest inversion. Above the budget the hint drops and
    // the bucketed layout must carry the join: SMJ with the edge side
    // straight off the bucketed scan, no hashpartitioning(a) exchange.
    import org.apache.spark.sql.functions._
    val below = graft.operators.Graph.pageRank(spark, sf, iters = 1)
    val pb = below.queryExecution.executedPlan.toString
    assert(pb.contains("BroadcastHashJoin"),
      s"below-budget round join must broadcast the node state:\n$pb")
    assert(!"Exchange hashpartitioning\\(a#".r.findFirstIn(pb).isDefined,
      s"edge side must never re-shuffle on the node key:\n$pb")
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // regime 3 FIRST (round-12 ADVICE): above-budget state with the
    // planner's broadcast left at its DEFAULT threshold. The sf-test
    // edge table's file stats sit well under 10 MB, so without the
    // merge hint the planner would broadcast the EDGE side — the
    // measured-slowest inversion (7.8 s vs 4.4/5.0 s, BASELINE.md
    // round 10). stateSide must pin the SMJ here too.
    spark.conf.set("graft.graph.stateBroadcastMaxRows", "1")
    try {
      val smallEdge = graft.operators.Graph.pageRank(spark, sf, iters = 1)
      val ps = smallEdge.queryExecution.executedPlan.toString
      assert(!ps.contains("BroadcastHashJoin"),
        s"above-budget round join must not broadcast the small edge table either:\n$ps")
      assert(ps.contains("SortMergeJoin"),
        s"above-budget round join must be the measured SMJ even with edge stats under the broadcast threshold:\n$ps")
    } finally spark.conf.unset("graft.graph.stateBroadcastMaxRows")
    // force the above-budget regime: a 1-row state budget, and the
    // planner's own broadcast disabled the way a 100 TB edge table's
    // file stats would disable it
    spark.conf.set("graft.graph.stateBroadcastMaxRows", "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val above = graft.operators.Graph.pageRank(spark, sf, iters = 1)
      val pa = above.queryExecution.executedPlan.toString
      assert(!pa.contains("BroadcastHashJoin"),
        s"above-budget round join must not broadcast either side:\n$pa")
      assert(pa.contains("SortMergeJoin"),
        s"above-budget round join must fall back to SMJ:\n$pa")
      assert(pa.contains("Bucketed: true"),
        s"the SMJ fallback must read the bucketed edge scan:\n$pa")
      assert(!"Exchange hashpartitioning\\(a#".r.findFirstIn(pa).isDefined,
        s"the SMJ fallback must keep the edge side exchange-free:\n$pa")
      // strategy parity: the fallback changes the PLAN, never the
      // result. The two plans sum doubles in different orders, so
      // pr_norm (rounded to 6dp) can differ in the last digit when a
      // value lands on a rounding boundary — compare node-aligned
      // with a 1e-6 tolerance instead of exact row equality.
      val prAbove = above.collect().map(r => r.get(0) -> r.getDouble(1)).toMap
      val prBelow = below.collect().map(r => r.get(0) -> r.getDouble(1)).toMap
      assert(prAbove.keySet === prBelow.keySet,
        "state-side strategy switch altered the pageRank node set")
      prAbove.foreach { case (node, v) =>
        assert(math.abs(v - prBelow(node)) <= 1e-6,
          s"pr_norm for node $node drifted across strategies: $v vs ${prBelow(node)}")
      }
    } finally {
      spark.conf.unset("graft.graph.stateBroadcastMaxRows")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("co-purchase layout: the wedge self-join never degenerates and stays bucketed") {
    import org.apache.spark.sql.functions._
    val ori = graft.operators.Graph.copurOriented(spark, sf)
    val e1 = ori.as("e1"); val e2 = ori.as("e2")
    val wedges = e1.hint("merge").join(e2,
      col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
    val p = wedges.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge join degenerated:\n$p")
    assert(p.contains("Bucketed: true"), s"wedge join must read bucketed scans:\n$p")
    assert(!"Exchange hashpartitioning\\(a#".r.findFirstIn(p).isDefined,
      s"the self-join must not re-shuffle either side on the center key:\n$p")
  }

  test("hash sampling pushes the md5 filter below everything else") {
    val p = plan("sample_hash")
    assert(!p.contains("Exchange hashpartitioning"),
      "sampling must be a scan-side filter, not a shuffled operator")
  }

  test("jaccard prefix join generates candidates by shingle equality, never all pairs") {
    val p = plan("dedup_jaccard_prefix")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix join must stay an equality join on the prefix shingle:\n$p")
  }

  test("graph iterations join on vertex keys, never a cross product") {
    for (n <- Seq("graph_pagerank", "graph_components", "graph_bfs_hops")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n must stay equality-join shaped:\n$p")
    }
  }

  test("pmi and feature hashing stay map-side until their aggregations") {
    for (n <- Seq("txt_pmi_bigrams", "txt_feature_hash")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"),
        s"$n plans a cartesian product (the totals crossJoin must broadcast 1 row):\n$p")
    }
  }

  test("recommender/rules/LM/stats queries stay equality-join shaped") {
    // the only sanctioned non-equality shapes are the broadcast 1-row
    // scalar relations (vocab size, basket total, chi2 total, N)
    for (n <- Seq("rec_item_neighbors", "rec_user_topn", "assoc_rules",
      "txt_lm_perplexity", "txt_token_entropy", "markov_transitions",
      "chi2_type_dow", "ts_cusum_changepoints", "rfm_segments")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"),
        s"$n plans a cartesian product:\n$p")
    }
  }

  test("cusum windows partition by event type — never a global sort of the hourly relation") {
    val p = plan("ts_cusum_changepoints")
    // the two running windows must carry the event_type partitioning;
    // a missing partitionBy would show the WindowExec single-partition
    // warning shape (partition spec absent)
    assert("Window .*event_type".r.findFirstIn(p).isDefined
      || p.contains("PartitionBy"), // formatted variants
      s"cusum windows must partition by event_type:\n$p")
  }

  test("markov transition matrix windows per user and joins on the type key") {
    val p = plan("markov_transitions")
    assert(!p.contains("CartesianProduct"), p)
    assert("Window .*user_id".r.findFirstIn(p).isDefined,
      s"lead window must partition by user_id:\n$p")
  }

  test("hybrid RRF: both legs broadcast the query side; fusion joins on keys") {
    val p = plan("search_hybrid_rrf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"query relations (5 rows) must broadcast in both legs:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"hybrid fusion must stay equality-join shaped:\n$p")
  }

  test("CMS counters broadcast to the probe join; sketch stays partially aggregated") {
    val p = plan("sketch_cms_freq")
    // the 256-cell counter relation must be the broadcast side and the
    // big-side reduction must carry a map-side partial aggregate
    assert(p.contains("BroadcastHashJoin"),
      s"fixed-size counter table must broadcast:\n$p")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"counter build must partially aggregate map-side:\n$p")
  }

  test("new graph iterations (communities, sssp) stay equality-join shaped") {
    for (n <- Seq("graph_communities", "graph_sssp")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n must stay equality-join shaped:\n$p")
    }
  }

  test("bloom decontamination keeps the gram relation narrow through the verify join") {
    val p = plan("txt_decontaminate_bloom")
    assert(!p.contains("CartesianProduct"),
      s"verify join must be an equality join on fp:\n$p")
    // the exact-verify join ships fingerprints only, never text
    val joins = "ReadSchema: [^\\n]*".r.findAllIn(p).toSeq
    assert(joins.forall(s => !s.contains("n_chars")),
      s"unused doc columns must be pruned from every scan:\n${joins.mkString("\n")}")
  }

  test("KMV Aggregator plans as ObjectHashAggregate with a map-side partial") {
    val p = plan("sketch_kmv_agg")
    assert(p.contains("ObjectHashAggregate"),
      s"typed-Aggregator sketch must use the object hash aggregate path:\n$p")
    assert("partial_kmvaggregator|partial_kmv".r.findFirstIn(p.toLowerCase).isDefined
      || p.toLowerCase.contains("partial"),
      s"sketch must partially aggregate map-side (bounded state per partition):\n$p")
  }

  test("BM25 broadcasts query terms and corpus stats; scoring joins on keys") {
    val p = plan("search_bm25")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"query-term and df relations must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only the 1-row corpus-stats crossJoin may be non-equi (broadcast):\n$p")
  }

  test("PPR, k-core, and the manifest stay equality-join shaped") {
    for (n <- Seq("graph_ppr", "graph_kcore", "txt_pipeline_manifest")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"),
        s"$n plans a cartesian product:\n$p")
    }
  }

  test("KMV set ops: hashes attach by equality; the only non-equi joins enumerate type pairs") {
    val p = plan("sketch_kmv_setops")
    assert(!p.contains("CartesianProduct"), s"no cartesian allowed:\n$p")
    // the (ta < tb) pair enumeration over the per-TYPE relation (≤
    // #event-types rows, metadata-scale) is the sanctioned BNL shape —
    // but every join touching the hash relation must be an equality
    // join, so any BNL whose condition is not the type-pair inequality
    // is a regression
    val bnl = "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).toSeq
    assert(bnl.forall(l => "ta#\\d+ < tb#\\d+".r.findFirstIn(l).isDefined),
      s"a non-pair BNL join appeared (hash relation leaked into a loop join):\n${bnl.mkString("\n")}")
  }

  test("PII scrub is join-free map work: one exchange (the output sort), no join") {
    val p = plan("txt_pii_redact")
    assert(!p.contains("Join"), s"PII scrub must plan no join:\n$p")
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, // range exchange for the sort (+AQE read)
      s"PII scrub should shuffle nothing but the ordered output:\n$p")
  }

  test("DSIR weights: bucket side tables broadcast into the corpus aggregation") {
    val p = plan("mix_dsir_weights")
    assert(!p.contains("CartesianProduct"), s"dsir plans a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the dim-sized log-ratio relation must broadcast into the tf join:\n$p")
  }

  test("diversified/semantic/MMR retrieval additions plan no cartesian products") {
    // (the query-side broadcast nested loop of the exact candidate
    // scan is the sanctioned emb_knn shape; CartesianProduct is not)
    for (n <- Seq("search_topk_diverse", "emb_semantic_keep_lsh", "emb_mmr_rerank")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian product:\n$p")
    }
  }

  test("SemDeDup cluster rung: pair generation is an equality join on cluster_id") {
    // the k-row centroid broadcast nested loop inside Lloyd assignment
    // is the sanctioned scalar-broadcast shape; the PAIR join — the
    // term that would go quadratic — must be a hash/merge equality
    // join keyed on cluster_id, and nothing may plan a cartesian.
    // Inspect the edge-generation relation directly: the CC closure
    // checkpoints eagerly, so the registry query's final plan only
    // shows the keep-decision join.
    val p = graft.similarity.Similarity
      .clusteredEdgesOn(graft.similarity.Similarity.corpus(spark, sf), 0.3, 8, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cluster rung plans a cartesian:\n$p")
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cluster_id".r
      .findFirstIn(p).nonEmpty,
      s"no equality join on cluster_id found in the cluster-rung plan:\n$p")
  }

  test("cells rung: pair generation groups by cell keys — no cartesian, no vector shuffle before the verify join") {
    // the round-12 production rung: candidate pairs come from a
    // groupBy on (cluster_id, tbl, cell) over id+bucket rows — the
    // only joins carrying 64-dim vectors are the two id-equality
    // verify joins AFTER the distinct pair set is fixed. Nothing may
    // plan a cartesian, and the per-cluster plane-depth table (k1
    // rows) must broadcast rather than shuffle the bucket relation.
    val p = graft.similarity.Similarity
      .cellEdgesOn(graft.similarity.Similarity.corpus(spark, sf),
        0.3, 32, 16, 4, 2, 64)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cells rung plans a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"plane-depth table must broadcast into the bucket relation:\n$p")
    assert("HashAggregate.*keys=\\[cluster_id".r.findFirstIn(p).nonEmpty ||
      "(SortAggregate|ObjectHashAggregate).*keys=\\[cluster_id".r.findFirstIn(p).nonEmpty,
      s"no per-cell grouping found in the cells-rung plan:\n$p")
  }

  test("eval screening: the eval side broadcasts, the corpus is never exchanged into the join") {
    // emb_decontaminate / emb_hard_negatives: the benchmark-sized eval
    // relation must be the broadcast side; the training corpus scan
    // must reach the join without a shuffle exchange on the vectors
    for (n <- Seq("emb_decontaminate", "emb_hard_negatives")) {
      val p = plan(n)
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
        s"$n must broadcast the eval side:\n$p")
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian product:\n$p")
    }
  }

  test("histogram sketch: bin counts partial-aggregate map-side") {
    // the (event_type, bin) count must plan as HashAggregate partial →
    // final, so only bounded bin-state crosses the wire — the
    // mergeable-sketch contract the scaladoc claims
    val p = plan("sketch_hist_quantiles")
    assert(p.contains("HashAggregate"), s"bin counts must hash-aggregate:\n$p")
    assert(!p.contains("CartesianProduct"), s"sketch plans a cartesian product:\n$p")
  }

  test("KS drift: per-type stats broadcast and the values shuffle once") {
    val p = plan("ts_ks_drift")
    assert(!p.contains("CartesianProduct"), s"ks plans a cartesian product:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the config-sized midpoint/totals relations must broadcast:\n$p")
  }

  test("logreg training: the dim-row weight table broadcasts into every scoring join") {
    val p = plan("txt_logreg_scores")
    assert(!p.contains("CartesianProduct"), s"logreg plans a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the weight table must broadcast into the tf join:\n$p")
  }

  test("temperature weights stay on config-sized relations: no data-sized exchange after the per-source aggregate") {
    val p = plan("mix_temperature")
    assert(!p.contains("CartesianProduct"),
      s"mix_temperature plans a cartesian product:\n$p")
    // the two scalar normalizers must be broadcast, not joined by key
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"scalar totals must broadcast:\n$p")
  }

  test("global ntile rides the two-level rank: range shuffle on the fact table, no unpartitioned ntile window") {
    // round-12: ntile().over(Window.orderBy(..)) plans Exchange
    // SinglePartition over the WHOLE fact table (measured 30.9 s vs
    // 5.2 s at 100x). The scalable shape: repartitionByRange carries
    // the parallel sort; the only windows are per-range-partition
    // (partitionBy __pid) plus the bounded per-partition-count prefix
    // sum; bucket assignment is arithmetic on the global row number.
    // The branch is data-driven (Relational.globalRankMinRows, default
    // 8M rows — below it the single-task window measurably wins 3–4×),
    // so the contract pins the gate to exercise the distributed shape
    // even on the sf0.001 fixture, then asserts the mirror: below the
    // gate the plain window is chosen.
    val gate = "graft.window.globalRankMinRows"
    spark.conf.set(gate, "0")
    try {
      val p = plan("w_ntile_quartiles")
      assert(p.toLowerCase.contains("rangepartitioning"),
        s"fact table must range-partition for the parallel sort:\n$p")
      assert(!p.contains("ntile("),
        s"positional bucketing must be arithmetic, not an ntile window:\n$p")
    } finally spark.conf.unset(gate)
    // mirror: the sf0.001 fixture sits far below the default gate, so
    // the plain single-task ntile window (the measured small-n winner)
    // must plan — no two-level machinery on relations one task handles
    val small = plan("w_ntile_quartiles")
    assert(small.contains("ntile("),
      s"below the gate the plain ntile window must be chosen:\n$small")
  }

  test("expanding z-score rides two-phase moments: no per-type full-history window above the gate") {
    // with ~10 event types at 100 TB, Window.partitionBy(event_type)
    // .orderBy(ts, ...) puts each type's WHOLE history in one task
    // (7.8x/decade at the round-12 100x anchor). Above the gate the
    // plan must range-partition and every data-sized window must be
    // per-range-slice (partitionBy __pid first); the only per-type
    // window left is the bounded prefix cumulation ordered by __pid.
    val gate = "graft.window.globalRankMinRows"
    spark.conf.set(gate, "0")
    try {
      val p = plan("w_expanding_zscore")
      assert(p.toLowerCase.contains("rangepartitioning"),
        s"fact table must range-partition for the parallel expanding sums:\n$p")
      assert(!p.contains("windowspecdefinition(event_type#") ||
        !"""windowspecdefinition\(event_type#\d+, ts#""".r.findFirstIn(p).isDefined,
        s"no data-sized window may partition by event_type alone:\n$p")
    } finally spark.conf.unset(gate)
    // mirror: below the gate the plain per-type window is chosen
    val small = plan("w_expanding_zscore")
    assert("""windowspecdefinition\(event_type#\d+, ts#""".r.findFirstIn(small).isDefined,
      s"below the gate the plain expanding window must be chosen:\n$small")
  }

  test("hard negatives plan a partial bounded top-k aggregate, not a sort/window") {
    // round-17 (VERDICT item 1): the row_number() window form globally
    // sorted the ~4B-row query×candidate join output (33×/decade at
    // the 100× anchor). The TopCosAggregator plan must (a) run as an
    // ObjectHashAggregate with a PARTIAL mode instance — map-side
    // keep-k so the shuffle carries ≤ queries×k×partitions rows — and
    // (b) plan no Window and no sort over the join output (the only
    // sort allowed is the final presentation orderBy on the ≤
    // queries×k result).
    val p = plan("emb_hard_negatives")
    assert(p.contains("ObjectHashAggregate"),
      s"bounded top-k must aggregate, not sort:\n$p")
    assert(p.contains("partial_"),
      s"the top-k aggregate must have a map-side partial instance:\n$p")
    assert(!p.contains("Window"),
      s"no per-candidate rank window may survive:\n$p")
  }

  test("top-k ranks plan as TakeOrdered, not a single-partition rank over every candidate") {
    // pmi bigrams / session paths: rank-then-filter funneled every
    // qualifying bigram / distinct path through one window task;
    // orderBy().limit(k) plans TakeOrderedAndProject (distributed
    // heap-select), and the rank window then runs on k rows only.
    for (q <- Seq("txt_pmi_bigrams", "session_paths")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q must select its top-k via TakeOrderedAndProject:\n$p")
    }
  }
}
