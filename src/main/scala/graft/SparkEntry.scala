package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Events, Relational}
import graft.text.TextAnalysis
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the correctness surface: one entry per implemented
  * operator family from SURVEY.md §2; each SQL-expressible entry has a
  * matching DuckDB oracle in `oracleSql` with identical column names
  * (aggregates aliased on both sides) and a deterministic ORDER BY so
  * the driver's sorted-column hash compare is stable. Doubles are
  * rounded to fixed decimals on both sides to absorb summation-order
  * differences between engines.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (SURVEY §7.1 minimum end-to-end slice):
    * frequent event-type pairs — scan, distinct, self-join, agg,
    * having-filter, sort. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    Events.frequentPairs(spark, "/root/testdata/sf0.001", minSupport = 1L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- scans / filters (SURVEY §2.1–§2.2) ---
    "s2_point_lookup" -> ((s, d) => Relational.pointLookup(s, d)),
    "s3_filtered_scan" -> ((s, d) => Relational.filteredScan(s, d)),
    "s5_update_rewrite" -> ((s, d) => Relational.updateRewrite(s, d)),
    "s6_anti_join" -> ((s, d) => Relational.antiJoinNoOrders(s, d)),
    // --- joins (§2.3) ---
    "j_semi_join" -> ((s, d) => Relational.semiJoinOpenOrders(s, d)),
    "j_outer_join" -> ((s, d) => Relational.outerJoinNationCustomers(s, d)),
    "j1_frequent_pairs" -> ((s, d) => Events.frequentPairs(s, d)),
    // --- aggregations (§2.4) ---
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q3_shipping_priority" -> ((s, d) => Relational.shippingPriority(s, d)),
    "q5_local_supplier" -> ((s, d) => Relational.localSupplierVolume(s, d)),
    "q10_returned_revenue" -> ((s, d) => Relational.returnedItemRevenue(s, d)),
    "a3_top_event_types" -> ((s, d) => Events.topEventTypes(s, d)),
    "a4_distinct_users" -> ((s, d) => Events.distinctUsersPerType(s, d)),
    "a8_percentiles" -> ((s, d) => Relational.quantityPercentiles(s, d)),
    "a15_rate_limit" -> ((s, d) => Events.rateLimitAdmitDeny(s, d)),
    "rollup_acctbal" -> ((s, d) => Relational.rollupAcctbal(s, d)),
    // --- windows (§2.5) ---
    "w_argmax_order" -> ((s, d) => Relational.argmaxLargestOrder(s, d)),
    "w_lag_delta" -> ((s, d) => Relational.lagOrderDelta(s, d)),
    "w_running_spend" -> ((s, d) => Relational.runningCustomerSpend(s, d)),
    // --- set ops (§2.7) ---
    "set_ops" -> ((s, d) => Relational.setOps(s, d)),
    // --- scalar functions (§2.8) ---
    "f1_segments" -> ((s, d) => Relational.segmentStrings(s, d)),
    "f2_buckets" -> ((s, d) => Relational.acctbalBuckets(s, d)),
    "f7_orders_by_month" -> ((s, d) => Relational.ordersByMonth(s, d)),
    "f9_json_props" -> ((s, d) => Events.jsonPropsStats(s, d)),
    // --- streaming-shaped batch (§2.9) ---
    "st2_events_per_hour" -> ((s, d) => Events.eventsPerHour(s, d)),
    // --- text analysis (north star) ---
    "txt_token_stats" -> ((s, d) => TextAnalysis.tokenStats(s, d)),
    "txt_quality" -> ((s, d) => TextAnalysis.qualityScores(s, d)),
    "txt_lang_stats" -> ((s, d) => TextAnalysis.langStats(s, d)),
    "txt_fingerprints" -> ((s, d) => TextAnalysis.fingerprints(s, d).select("doc_id", "md5_fp")),
    "txt_lang_id" -> ((s, d) => TextAnalysis.languageId(s, d)),
    // --- dedup (north star) ---
    "dedup_exact" -> ((s, d) => Dedup.exactDedup(s, d)),
    "dedup_minhash_sig" -> ((s, d) => Dedup.minhashSignatures(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardTopPairs(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(Tables(s, d, "documents")).orderBy("doc_id")),
    // --- similarity search (north star) ---
    "emb_knn_cosine" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "emb_lsh_topk" -> ((s, d) => Similarity.lshTopK(s, d)),
    "emb_norm_stats" -> ((s, d) => Similarity.normStats(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "s2_point_lookup" ->
      "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey = 42",
    "s3_filtered_scan" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 300000.0
        |ORDER BY o_orderkey""".stripMargin,
    "s5_update_rewrite" ->
      """SELECT c_custkey, round(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END, 2) AS acctbal_clamped
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "s6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin,
    "j_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "j_outer_join" ->
      """SELECT n_name, count(c_custkey) AS n_customers
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "j1_frequent_pairs" ->
      """WITH ev AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS support
        |FROM ev a JOIN ev b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY support DESC, type_a, type_b""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q10_returned_revenue" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "a3_top_event_types" ->
      """SELECT event_type, count(*) AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, event_type LIMIT 5""".stripMargin,
    "a4_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "a8_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.4), 4) AS p40,
        |  round(quantile_cont(l_quantity, 0.8), 4) AS p80,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "a15_rate_limit" ->
      """WITH numbered AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts) ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN rn <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS admitted,
        |  CAST(sum(CASE WHEN rn > 5 THEN 1 ELSE 0 END) AS BIGINT) AS denied
        |FROM numbered GROUP BY 1 ORDER BY 1""".stripMargin,
    "rollup_acctbal" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |  round(sum(c_acctbal), 2) AS total_bal, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""".stripMargin,
    "w_argmax_order" ->
      """SELECT o_custkey, o_orderkey, totalprice FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "w_lag_delta" ->
      """SELECT o_custkey, o_orderkey,
        |  round(o_totalprice - lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS delta
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "set_ops" ->
      """SELECT 'furniture_no_orders' AS tag, c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
        |  EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'furniture_with_orders' AS tag, c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
        |  INTERSECT SELECT o_custkey FROM orders)
        |ORDER BY tag, c_custkey""".stripMargin,
    "f1_segments" ->
      """SELECT c_custkey,
        |  'seg:' || coalesce(c_mktsegment, 'UNK') || '|geo:' || coalesce(n_name, 'UNK') || '|bal:' ||
        |  (CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END) AS segment
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,
    "f2_buckets" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket,
        |  count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "f7_orders_by_month" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "f9_json_props" ->
      """SELECT event_type, round(avg(k), 4) AS avg_k, max(k) AS max_k, count(k) AS n_with_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events) t
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "st2_events_per_hour" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
        |  count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "txt_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
        |  round(list_sum(list_transform(string_split(text, ' '), x -> CAST(len(x) AS DOUBLE)))
        |    / len(string_split(text, ' ')), 4) AS avg_token_len,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "txt_quality" ->
      """SELECT doc_id, n_tokens, stopword_ratio, type_token_ratio,
        |  CASE WHEN n_tokens < 20 THEN 'short' WHEN stopword_ratio > 0.2 THEN 'boilerplate' ELSE 'ok' END AS quality_class
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    round(CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE)
        |      / len(string_split(text, ' ')), 4) AS stopword_ratio,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')), 4) AS type_token_ratio
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "txt_lang_stats" ->
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "txt_fingerprints" ->
      "SELECT doc_id, md5(text) AS md5_fp FROM documents ORDER BY doc_id",
    "dedup_exact" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keeper_doc_id""".stripMargin,
    "dedup_minhash_sig" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(t) < 3 THEN [text]
        |      ELSE list_transform(range(0, len(t) - 2), i -> array_to_string(t[i+1:i+3], ' ')) END) AS shingle
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) raw)
        |SELECT doc_id,
        |  min(md5('0:' || shingle)) AS mh0,
        |  min(md5('1:' || shingle)) AS mh1,
        |  min(md5('2:' || shingle)) AS mh2,
        |  min(md5('3:' || shingle)) AS mh3,
        |  md5(min(md5('0:' || shingle)) || min(md5('1:' || shingle)) ||
        |      min(md5('2:' || shingle)) || min(md5('3:' || shingle))) AS band0
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(t) < 3 THEN [text]
        |      ELSE list_transform(range(0, len(t) - 2), i -> array_to_string(t[i+1:i+3], ' ')) END) AS shingle
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) raw),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  round(n_inter * 1.0 / (sa.n + sb.n - n_inter), 4) AS jaccard
        |FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 10""".stripMargin,
    "emb_knn_cosine" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
        |scored AS (
        |  SELECT query_id, c.vec_id AS cand_id,
        |    list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS cos
        |  FROM q JOIN c ON c.vec_id <> q.query_id)
        |SELECT query_id, rank, cand_id, round(cos, 4) AS cos_sim FROM (
        |  SELECT query_id, cand_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rank
        |  FROM scored) t
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "emb_norm_stats" ->
      """SELECT label, count(*) AS n,
        |  round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_l2_norm
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
