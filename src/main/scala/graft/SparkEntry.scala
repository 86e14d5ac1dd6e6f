package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, plus DuckDB-runnable oracle SQL for every
  * SQL-expressible one. Column names and types are aligned between the
  * Spark plan and the oracle (the driver hash-compares after sorting
  * columns by name).
  */
object SparkEntry {

  /** Flagship: langram-style language-ID over documents on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    LangOps.q21LangId(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational operator inventory (SURVEY.md §2.2)
    "q01_pricing_summary" -> (Relational.q01PricingSummary _),
    "q02_filter_pushdown" -> (Relational.q02FilterPushdown _),
    "q03_broadcast_join" -> (Relational.q03BroadcastJoin _),
    "q04_shuffle_join_agg" -> (Relational.q04ShuffleJoinAgg _),
    "q05_topk" -> (Relational.q05TopK _),
    "q06_window_rank" -> (Relational.q06WindowRank _),
    "q07_distinct_agg" -> (Relational.q07DistinctAgg _),
    "q08_semi_anti" -> (Relational.q08SemiAnti _),
    "q09_set_ops" -> (Relational.q09SetOps _),
    "q10_sessionize" -> (Relational.q10Sessionize _),
    "q11_rollup" -> (Relational.q11Rollup _),
    "q12_exists_subquery" -> (Relational.q12ExistsSubquery _),
    "q13_scalar_agg" -> (Relational.q13ScalarAgg _),
    "q31_asof_join" -> (Relational.q31AsofJoin _),
    "q32_percentiles" -> (Relational.q32Percentiles _),
    "q33_strings" -> (Relational.q33Strings _),
    "q34_dates" -> (Relational.q34Dates _),
    "q35_cube" -> (Relational.q35Cube _),
    "q36_time_buckets" -> (Relational.q36TimeBuckets _),
    // text analysis / training-data ops
    "q14_tokens" -> (TextOps.q14Tokens _),
    "q15_quality" -> (TextOps.q15Quality _),
    "q16_dedup_exact" -> (TextOps.q16DedupExact _),
    "q17_minhash_pairs" -> ((s: SparkSession, d: String) => TextOps.q17MinHashPairs(s, d)),
    "q18_simhash" -> (TextOps.q18SimHash _),
    "q19_ngram_jaccard" -> ((s: SparkSession, d: String) => TextOps.q19NgramJaccard(s, d)),
    "q22_scrub" -> (TextOps.q22Scrub _),
    "q24_fingerprint" -> (TextOps.q24Fingerprint _),
    "q25_repetition" -> (TextOps.q25Repetition _),
    // language ID (langram-equivalent core)
    "q21_langid" -> (LangOps.q21LangId _),
    "q23_lang_profile" -> (LangOps.q23LangProfile _),
    // similarity search / multimodal plumbing
    "q20_ann_brute_force" -> ((s: SparkSession, d: String) => Similarity.q20AnnBruteForce(s, d)),
    "q26_lsh_ann" -> ((s: SparkSession, d: String) => Similarity.q26LshAnn(s, d)),
    "q30_ivf_ann" -> ((s: SparkSession, d: String) => Similarity.q30IvfAnn(s, d)),
    "q27_multimodal_features" -> (Similarity.q27MultimodalFeatures _),
    "q38_embedding_health" -> (Similarity.q38EmbeddingHealth _),
    "q37_frame_sample" -> ((s: SparkSession, d: String) => Similarity.q37FrameSample(s, d)),
    // the full quality-filter pipeline over a generated pages corpus
    "q28_pipeline_filter" -> ((s: SparkSession, _: String) =>
      graft.pipeline.FilterPipeline.runGenerated(s, 3000)),
    // Distributed trainer: documents table -> EXACT-FRACTION model rows
    // (groupBy-count + prefix/suffix self-joins). Fractions are the
    // reference's own model-file semantic (ln applied at load), and they
    // make the trainer DuckDB-oracle-able with integer equality. The
    // table's 2-letter lang codes map to registry codes; 'zh' drops on
    // both sides (its ASCII text has zero Han training words).
    "q29_spark_trainer" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.functions.expr
      val corpus = Tables.documents(s, dir).select(
        expr("""CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'deu'
                WHEN 'fr' THEN 'fra' WHEN 'es' THEN 'spa' ELSE lang END""").as("lang"),
        org.apache.spark.sql.functions.col("text").as("line"))
      graft.train.Trainer.trainSparkFractions(s, corpus)
    }),
    // Near-dup cluster resolution: connected components over the q17
    // pair graph (alternating large-star/small-star) + keep-one canonical
    // selection — the pairs -> clusters -> dedup'd-corpus stage.
    "q39_neardup_clusters" ->
      ((s: SparkSession, d: String) => Clusters.q39NearDupClusters(s, d)),
    // Quality-aware canonical selection over the q39 clusters: keep the
    // longest member (doc_id tiebreak), the keep-the-best-variant rule.
    "q40_canonical_keep" ->
      ((s: SparkSession, d: String) => Clusters.q40CanonicalKeep(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | round(l_extendedprice*l_discount,4) AS disc_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q03_broadcast_join" ->
      """SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal),2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q04_shuffle_join_agg" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS total
        |FROM orders ORDER BY total DESC, o_orderkey LIMIT 10""".stripMargin,
    "q06_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS total, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t WHERE rn <= 3""".stripMargin,
    "q07_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // EXISTS / NOT EXISTS, not IN / NOT IN: the Spark side is a true
    // semi/anti join, and NOT IN diverges from anti-join semantics the
    // moment o_custkey carries a null (NOT IN returns NULL for every
    // unmatched row; the fuzz gate runs this oracle over null-bearing keys)
    "q08_semi_anti" ->
      """SELECT 'with_orders' AS kind, count(*) AS n FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders' AS kind, count(*) AS n FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q09_set_ops" ->
      """SELECT 'intersect' AS op, count(*) AS n FROM
        | (SELECT l_partkey AS k FROM lineitem INTERSECT SELECT p_partkey FROM part) t1
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS n FROM
        | (SELECT p_partkey AS k FROM part EXCEPT SELECT l_partkey FROM lineitem) t2
        |UNION ALL
        |SELECT 'union_distinct' AS op, count(*) AS n FROM
        | (SELECT l_partkey AS k FROM lineitem UNION SELECT p_partkey FROM part) t3""".stripMargin,
    "q10_sessionize" ->
      """WITH e AS (
        | SELECT user_id, event_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |s AS (
        | SELECT user_id, event_id,
        |  sum(CASE WHEN prev_ts IS NULL
        |           OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        | FROM e),
        |g AS (SELECT user_id, session_id, count(*) AS n_events
        |      FROM s GROUP BY user_id, session_id)
        |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q11_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        | coalesce(l_linestatus, 'ALL') AS linestatus,
        | round(sum(l_quantity),2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q12_exists_subquery" ->
      """SELECT o_orderstatus, count(*) AS n_orders, round(sum(o_totalprice),2) AS total
        |FROM orders WHERE EXISTS
        | (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q13_scalar_agg" ->
      """SELECT count(*) AS n_rows, round(sum(l_extendedprice),2) AS sum_price,
        | round(min(l_extendedprice),2) AS min_price,
        | round(max(l_extendedprice),2) AS max_price,
        | count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem""".stripMargin,
    "q31_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_event_id, user_id AS u2, ts AS ts2
        |      FROM events WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id, view_event_id
        |FROM c ASOF JOIN v ON c.user_id = v.u2 AND c.ts >= v.ts2""".stripMargin,
    "q32_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        | round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
        | round(quantile_cont(l_quantity, 0.25), 2) AS qty_p25
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q33_strings" ->
      """SELECT p_partkey, upper(p_name) AS uname, substr(p_type, 1, 5) AS t5,
        | p_brand || '-' || p_type AS label, length(p_name) AS name_len,
        | levenshtein(p_brand, p_type) AS lev
        |FROM part""".stripMargin,
    // `||`, not concat(): DuckDB's concat SKIPS null arguments while
    // Spark's concat null-propagates — || null-propagates in both
    // (fuzz-gate find; identical on null-free clean data)
    "q34_dates" ->
      """SELECT date_trunc('month', o_orderdate) AS m,
        | extract(year FROM o_orderdate) AS y,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "q35_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q36_time_buckets" ->
      """SELECT time_bucket(INTERVAL 6 HOURS, ts) AS bucket, event_type,
        | count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q14_tokens" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        | length(text) AS n_chars_computed,
        | len(string_split_regex(text, '[a-z]+')) - 1 AS n_letter_runs
        |FROM documents""".stripMargin,
    "q15_quality" ->
      """SELECT doc_id, len(string_split(text,' ')) AS word_count,
        | len(list_distinct(string_split(text,' '))) AS distinct_words,
        | round(list_aggregate(list_transform(string_split(text,' '), x -> length(x)), 'sum')::DOUBLE
        |       / len(string_split(text,' ')), 4) AS avg_word_len
        |FROM documents""".stripMargin,
    "q16_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    // brute-force 5-gram Jaccard >= 0.7 pair set; the Spark side computes
    // the SAME set via calibrated MinHash banding + exact verify (TextOps
    // scaladoc derives the 1e-9 per-pair miss bound)
    "q17_minhash_pairs" ->
      """WITH g AS (
        | SELECT doc_id,
        |  unnest(list_distinct([substr(text, i, 5) for i in range(1, length(text) - 3)])) AS gr
        | FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |co AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |       FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  round(c::DOUBLE / (sa.n + sb.n - c), 4) AS jaccard
        |FROM co JOIN sz sa ON sa.doc_id = co.da JOIN sz sb ON sb.doc_id = co.db
        |WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.7""".stripMargin,
    // simhash recomputed from md5 hex digits: bit 4k+j of the token hash =
    // bit j of hex digit k (first 15 digits = 60 bits)
    "q18_simhash" ->
      """WITH toks AS (
        | SELECT doc_id, md5(w) AS h
        | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        | WHERE w <> ''),
        |digits AS (
        | SELECT doc_id, i, strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS d
        | FROM toks, generate_series(1, 15) t(i)),
        |bits AS (
        | SELECT doc_id, 4 * (i - 1) + j AS b,
        |  sum(CASE WHEN (d >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
        | FROM digits, generate_series(0, 3) u(j)
        | GROUP BY doc_id, 4 * (i - 1) + j),
        |sh AS (
        | SELECT doc_id,
        |  sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
        | FROM bits GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(sh.simhash, 0)::BIGINT AS simhash
        |FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id""".stripMargin,
    // the LEFT JOIN + coalesce encodes the operator's convention for
    // token-less documents (null or empty text, whitespace-only): every
    // document HAS a simhash, and the empty simhash is 0 — empty docs
    // dedup together. Identical on clean data (every doc has tokens).
    // brute-force within-source 5-gram Jaccard >= 0.3; the Spark side is
    // the prefix-filtered EXACT similarity join (same output set)
    "q19_ngram_jaccard" ->
      """WITH g AS (
        | SELECT doc_id, source,
        |  unnest(list_distinct([substr(text, i, 5) for i in range(1, length(text) - 3)])) AS gr
        | FROM documents),
        |sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |co AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
        |       FROM g a JOIN g b
        |       ON a.gr = b.gr AND a.source = b.source AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  round(c::DOUBLE / (sa.n + sb.n - c), 4) AS jaccard
        |FROM co JOIN sz sa ON sa.doc_id = co.da JOIN sz sb ON sb.doc_id = co.db
        |WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.3""".stripMargin,
    "q24_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_hash,
        | CASE WHEN length(text) >= 5 THEN
        |  list_min([md5(substr(text, i, 5)) for i in range(1, length(text) - 3)])
        | ELSE NULL END AS min_shingle
        |FROM documents""".stripMargin,
    "q27_multimodal_features" ->
      """SELECT doc_id, strlen(text)::BIGINT AS payload_bytes,
        | (length(text) - length(regexp_replace(text, '[\x01-\x1f]', '', 'g')))::BIGINT AS f0,
        | (length(text) - length(regexp_replace(text, '[\x20-\x3f]', '', 'g')))::BIGINT AS f1,
        | (length(text) - length(regexp_replace(text, '[\x40-\x5f]', '', 'g')))::BIGINT AS f2,
        | (length(text) - length(regexp_replace(text, '[\x60-\x7f]', '', 'g')))::BIGINT AS f3,
        | (CASE WHEN text IS NULL THEN NULL ELSE 0 END)::BIGINT AS f4,
        | (CASE WHEN text IS NULL THEN NULL ELSE 0 END)::BIGINT AS f5,
        | (CASE WHEN text IS NULL THEN NULL ELSE 0 END)::BIGINT AS f6,
        | (CASE WHEN text IS NULL THEN NULL ELSE 0 END)::BIGINT AS f7
        |FROM documents""".stripMargin,
    // embedding-corpus health: corrupt-vector counts (see
    // Similarity.q38EmbeddingHealth — the observable that keeps the
    // corrupt-cosine 0.0 convention from silently masking a failed
    // embedder). coalesce(,0)=0 matches Spark's fold identity on empty
    // lists; a sum of squares is 0 iff all elements are ±0 in any
    // float width, so the engines' accumulator widths cannot disagree.
    "q38_embedding_health" ->
      """SELECT count(*) AS n_vecs,
        | count(*) FILTER (embedding IS NULL) AS n_null,
        | count(*) FILTER (
        |   len(list_filter(embedding, x -> isnan(x) OR isinf(x))) > 0) AS n_nonfinite,
        | count(*) FILTER (embedding IS NOT NULL AND coalesce(
        |   list_aggregate(list_transform(embedding, x -> x * x), 'sum'), 0.0) = 0.0
        |   AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0) AS n_zero_norm,
        | min(len(embedding))::BIGINT AS min_dim,
        | max(len(embedding))::BIGINT AS max_dim
        |FROM embeddings""".stripMargin,
    // VARCHAR slicing == binary slicing for the ASCII synthetic payloads
    // (the Spark side slices the real BINARY column)
    "q37_frame_sample" ->
      """SELECT doc_id, i AS frame_idx,
        | (i * strlen(text) // 4) + 1 AS frame_offset,
        | md5(substr(text, (i * strlen(text) // 4) + 1, 16)) AS frame_md5
        |FROM documents, generate_series(0, 3) t(i)
        |WHERE (i * strlen(text) // 4) + 16 <= strlen(text)""".stripMargin,
    // The CASE encodes the engine's corrupt-embedding convention
    // EXPLICITLY (CosineSim scaladoc): a zero-norm or non-finite vector
    // yields cosine 0.0, never NaN — in DuckDB the same pair reads NULL
    // (0/0 division → NULL) or NaN, and NaN would otherwise WIN a
    // descending top-k in both engines. Exercised by the fuzz gate's
    // planted zero/NaN/Inf vectors; a no-op on clean embeddings.
    // NULL embeddings are excluded on both sides (WHERE embedding IS NOT
    // NULL, mirroring the Spark filter and q26/q30): the CASE handles only
    // the corrupt-but-present (zero-norm 0/0 → NULL, NaN element) rows.
    "q20_ann_brute_force" ->
      """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |           WHERE embedding IS NOT NULL),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
        |raw AS (
        | SELECT query_id, vec_id,
        |  list_dot_product(qv, v) /
        |   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS c0
        | FROM emb CROSS JOIN q WHERE vec_id <> query_id),
        |scored AS (
        | SELECT query_id, vec_id,
        |  CASE WHEN c0 IS NULL OR isnan(c0) THEN 0.0 ELSE c0 END AS cos
        | FROM raw),
        |ranked AS (SELECT query_id, vec_id, cos,
        | row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
        | FROM scored)
        |SELECT query_id, rnk, vec_id, round(cos,6) AS cos FROM ranked WHERE rnk <= 5""".stripMargin,
    "q22_scrub" ->
      """SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,
        | '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        | '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g'),
        | '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed_text
        |FROM documents""".stripMargin,
    "q25_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |c AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w)
        |SELECT doc_id, round(max(c)::DOUBLE/sum(c), 4) AS repetition_ratio,
        | sum(c)::BIGINT AS n_words
        |FROM c GROUP BY doc_id""".stripMargin,
    // `__OUT_DIR__` is substituted by graft.Verify with the ABSOLUTE dump
    // directory at dump time: these two oracles aggregate/recompute over
    // OTHER dumped query outputs, checking the distributed aggregation
    // (q23 over q21's per-doc labels) and the keep/drop gate logic (q28
    // over its own kernel feature columns) in DuckDB. The detection
    // kernel itself is gated by the sbt suites (mock parity, golden
    // corpus, held-out accuracy), not SQL — DuckDB cannot express it.
    // ANN recall oracles (q26/q30): DuckDB recomputes `cos` from the RAW
    // embeddings table (a dishonest neighbor or score fails the hash) and
    // the exact-top-5 membership flag from the dumped q20 output — per-row
    // auditable recall evidence; the ≥0.9 recall@1 gate over the whole
    // corpus stays in SimilaritySpec (DuckDB cannot rank what LSH pruned).
    // emb CTEs below filter NULL embeddings: the engine skips them at
    // ingestion so no reported row references one, and DuckDB 1.0's
    // list_dot_product(v, v) (same column on both sides) ERRORS on a
    // vector batch containing NULL lists instead of yielding NULL.
    "q26_lsh_ann" ->
      """WITH ann AS (SELECT * FROM read_parquet('__OUT_DIR__/q26_lsh_ann/*.parquet')),
        |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |        WHERE embedding IS NOT NULL),
        |ex AS (SELECT query_id, list(vec_id) AS topk
        |       FROM read_parquet('__OUT_DIR__/q20_ann_brute_force/*.parquet')
        |       GROUP BY query_id),
        |raw AS (
        | SELECT a.vec_id, a.ann_vec_id,
        |  list_dot_product(e1.v, e2.v) /
        |   (sqrt(list_dot_product(e1.v, e1.v)) * sqrt(list_dot_product(e2.v, e2.v))) AS c0
        | FROM ann a
        | JOIN emb e1 ON e1.vec_id = a.vec_id
        | JOIN emb e2 ON e2.vec_id = a.ann_vec_id)
        |SELECT r.vec_id, r.ann_vec_id,
        | round(CASE WHEN c0 IS NULL OR isnan(c0) THEN 0.0 ELSE c0 END, 6) AS cos,
        | list_contains(ex.topk, r.ann_vec_id) AS ann_in_exact_top5
        |FROM raw r
        |LEFT JOIN ex ON ex.query_id = r.vec_id""".stripMargin,
    "q30_ivf_ann" ->
      """WITH ann AS (SELECT * FROM read_parquet('__OUT_DIR__/q30_ivf_ann/*.parquet')),
        |emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |        WHERE embedding IS NOT NULL),
        |ex AS (SELECT query_id, list(vec_id) AS topk
        |       FROM read_parquet('__OUT_DIR__/q20_ann_brute_force/*.parquet')
        |       GROUP BY query_id)
        |SELECT a.query_id, a.rnk, a.vec_id,
        | round(CASE WHEN c.c0 IS NULL OR isnan(c.c0) THEN 0.0 ELSE c.c0 END, 6) AS cos,
        | list_contains(ex.topk, a.vec_id) AS in_exact_top5
        |FROM ann a
        |JOIN emb q ON q.vec_id = a.query_id
        |JOIN emb e ON e.vec_id = a.vec_id
        |CROSS JOIN LATERAL (SELECT list_dot_product(q.v, e.v) /
        |  (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS c0) c
        |JOIN ex ON ex.query_id = a.query_id""".stripMargin,
    "q23_lang_profile" ->
      """SELECT lang_detected, count(*) AS n_docs,
        | sum(round(confidence * 10000)::BIGINT)::BIGINT AS conf_sum_e4
        |FROM read_parquet('__OUT_DIR__/q21_langid/*.parquet')
        |GROUP BY lang_detected""".stripMargin,
    "q28_pipeline_filter" ->
      """WITH f AS (SELECT * FROM read_parquet('__OUT_DIR__/q28_pipeline_filter/*.parquet')),
        |g AS (SELECT url, warc_ts, host, lang, confidence, perplexity,
        |  coverage, word_count, repetition_ratio, avg_word_len,
        |  stopword_ratio, n_lines, max_line_len, text_hash, scrubbed_text,
        |  is_dup,
        |  CASE WHEN is_dup THEN 'dup'
        |       WHEN word_count < 20 THEN 'too_short'
        |       WHEN repetition_ratio > 0.3 THEN 'repetition'
        |       WHEN confidence < 0.5 THEN 'low_confidence'
        |       WHEN coverage < 0.2 THEN 'low_coverage'
        |       WHEN perplexity > 10000.0 THEN 'high_perplexity'
        |       END AS drop_reason
        | FROM f)
        |SELECT *, (drop_reason IS NULL) AS keep FROM g""".stripMargin,
    // Trainer oracle: recompute the exact-fraction model from `documents`
    // in SQL. Word split mirrors the tokenizer on ASCII (maximal [a-z]
    // runs after lower()); unigrams/wordgrams over per-language totals;
    // n >= 2 relative to min(prefix, suffix) counts via self-joins.
    "q29_spark_trainer" ->
      """WITH docs AS (
        |  SELECT CASE lang WHEN 'en' THEN 'eng' WHEN 'de' THEN 'deu'
        |              WHEN 'fr' THEN 'fra' WHEN 'es' THEN 'spa' END AS lang, text
        |  FROM documents WHERE lang IN ('en','de','fr','es')),
        |words AS (
        |  SELECT lang, u.w FROM docs,
        |    unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS u(w)
        |  WHERE u.w <> ''),
        |grams AS (
        |  -- DuckDB's range() cannot take lateral column bounds: use a
        |  -- fixed position range and filter (corpus max word length is 8;
        |  -- 64 leaves headroom and matches nothing beyond length(w))
        |  SELECT lang, n::INTEGER AS size, substr(w, i::INTEGER, n::INTEGER) AS ngram
        |  FROM words, range(1, 6) t(n), range(1, 65) s(i)
        |  WHERE i + n - 1 <= length(w)),
        |counts AS (SELECT lang, size, ngram, count(*)::BIGINT AS c
        |           FROM grams GROUP BY 1, 2, 3),
        |uni AS (
        |  SELECT lang, size, ngram, c AS freq,
        |    (sum(c) OVER (PARTITION BY lang))::BIGINT AS denom
        |  FROM counts WHERE size = 1),
        |wrd AS (
        |  SELECT lang, 0::INTEGER AS size, w AS ngram, count(*)::BIGINT AS freq,
        |    (sum(count(*)) OVER (PARTITION BY lang))::BIGINT AS denom
        |  FROM words GROUP BY lang, w),
        |hi AS (
        |  SELECT c.lang, c.size, c.ngram, c.c AS freq, least(p.c, s.c) AS denom
        |  FROM counts c
        |  JOIN counts p ON p.lang = c.lang AND p.size = c.size - 1
        |   AND p.ngram = substr(c.ngram, 1, c.size - 1)
        |  JOIN counts s ON s.lang = c.lang AND s.size = c.size - 1
        |   AND s.ngram = substr(c.ngram, 2, c.size - 1)
        |  WHERE c.size >= 2)
        |SELECT * FROM uni UNION ALL SELECT * FROM wrd UNION ALL SELECT * FROM hi""".stripMargin,
    // Cluster resolution oracle: transitive closure over the DUMPED q17
    // pair set (itself hash-gated against the DuckDB brute-force pair
    // oracle above) via a recursive CTE — min reachable doc_id per node,
    // singletons from the documents left join. DuckDB recursion replaces
    // the engine's O(log^2 n) star alternation; same fixpoint.
    "q39_neardup_clusters" ->
      """WITH RECURSIVE pairs AS (
        | SELECT doc_a, doc_b FROM read_parquet('__OUT_DIR__/q17_minhash_pairs/*.parquet')),
        |edges AS (
        | SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach AS (
        | SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges) t
        | UNION
        | SELECT e.u, rc.r FROM edges e JOIN reach rc ON rc.u = e.v),
        |lbl AS (SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u)
        |SELECT d.doc_id,
        | coalesce(l.cluster_id, d.doc_id) AS cluster_id,
        | d.doc_id = coalesce(l.cluster_id, d.doc_id) AS keep
        |FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id""".stripMargin,
    // Canonical-keep oracle over the DUMPED q39 labels (themselves
    // recursion-gated above): per-cluster rank by q15's word-count
    // definition, doc_id tiebreak; NULLS LAST pinned explicitly (Spark's
    // desc default) rather than trusting either engine's default.
    "q40_canonical_keep" ->
      """WITH lbl AS (
        | SELECT doc_id, cluster_id
        | FROM read_parquet('__OUT_DIR__/q39_neardup_clusters/*.parquet')),
        |wc AS (SELECT doc_id, len(string_split(text, ' ')) AS word_count
        |       FROM documents),
        |j AS (
        | SELECT l.doc_id, l.cluster_id, w.word_count,
        |  row_number() OVER (PARTITION BY l.cluster_id
        |    ORDER BY w.word_count DESC NULLS LAST, l.doc_id) AS rk
        | FROM lbl l JOIN wc w ON w.doc_id = l.doc_id)
        |SELECT doc_id, cluster_id, word_count, rk = 1 AS keep FROM j""".stripMargin
  )
}
