"""Catalog entries OUTSIDE the driver's graded window.

The grading driver records a CORRECTNESS row for the first 50 ``queries()``
entries only, so the public catalog keeps every builder while the graded
subset is an explicit ordered view (``catalog.GRADED_QUERIES``) — catalog
composition is decoupled from grader behavior: adding a query here never
forces deleting a graded one.

Every entry below still runs under pytest's full oracle sweep
(tests/test_oracle_parity.py parametrizes over the WHOLE catalog), so these
are value-checked against DuckDB at sf0.01 on every test run — they just
don't occupy a graded slot. Their semantics overlap queries that DO hold
graded slots (see COVERAGE.md), which is why they were the ones rotated out.

This module is imported at the BOTTOM of plans/catalog.py (after the shared
oracle helpers are defined); it imports those helpers lazily inside
``extra_queries()`` to keep the import order acyclic.
"""

from __future__ import annotations


def _golden_part_labeled_sql() -> str:
    """Every part row labeled with its resolved entity representative —
    the inner relation golden_records_duck survives on. Replays the
    resolved_part_entities chain (fuzzy pairs → recursive reachability
    → min-rep labels)."""
    from flink_rag_spark.operators.linkage import fuzzy_self_pairs_duck
    from flink_rag_spark.plans import llm
    prs = fuzzy_self_pairs_duck("part", "p_name",
                                llm.FUZZY_MATCH_DISTANCE,
                                "string_split({s}, ' ')[-1]")
    return f"""
WITH RECURSIVE
prs AS ({prs}),
edges AS (SELECT str_a AS u, str_b AS v FROM prs
          UNION SELECT str_b, str_a FROM prs),
walk(node, rep) AS (
  SELECT DISTINCT p_name, p_name FROM part
  UNION
  SELECT e.v, walk.rep FROM walk JOIN edges e ON e.u = walk.node),
lbl AS (SELECT node, MIN(rep) AS entity_rep FROM walk GROUP BY node)
SELECT part.*, lbl.entity_rep
FROM part JOIN lbl ON part.p_name = lbl.node"""


def extra_queries() -> list[tuple]:
    """(name, fn, oracle_sql | None, tags) tuples for the non-graded tail."""
    from flink_rag_spark.config import DEFAULT_CONFIG as CFG
    from flink_rag_spark.functions.hashing import (
        poly_hash_duck,
        shingle_hashes_duck,
        simhash_fp_duck,
        token_hashes_duck,
    )
    from flink_rag_spark.functions.textfns import (
        LANG_MARKERS,
        punct_ratio_duck,
        stopword_ratio_duck,
        token_count_duck,
    )
    from flink_rag_spark.functions.vector import cosine_duck
    from flink_rag_spark.operators.compression import (
        dequantize_duck,
        quantize_scale_duck,
    )
    from flink_rag_spark.operators.contrastive import hard_negatives_duck
    from flink_rag_spark.operators.curation import (
        deterministic_shuffle_duck,
        fuzzy_decontaminate_duck,
        mixture_sample_duck,
        split_assignments_duck,
        stratified_sample_duck,
        temperature_mixture_duck,
    )
    from flink_rag_spark.operators.drift import (
        distribution_distance_duck,
        embedding_drift_duck,
                                                 psi_drift_duck)
    from flink_rag_spark.operators.importance import dsir_select_duck
    from flink_rag_spark.operators.linkage import (fuzzy_self_pairs_duck,
                                                   golden_records_duck)
    from flink_rag_spark.operators.sequences import (
        all_funnel_matches_duck,
        cohort_retention_duck,
        first_touch_attribution_duck,
        frequent_paths_duck,
        time_decay_attribution_duck,
        ushaped_attribution_duck,
        consecutive_funnel_times_duck,
        consumed_funnel_matches_duck,
        any_funnel_matches_duck,
        skip_to_funnel_matches_duck,
        event_transitions_duck,
        funnel_conversion_stats_duck,
        funnel_summary_duck,
        last_touch_attribution_duck,
        linear_attribution_duck,
        Group,
        greedy_funnel_times_duck,
        group_funnel_times_duck,
        negated_funnel_times_duck,
        optional_funnel_times_duck,
        quantified_funnel_times_duck,
        session_stats_duck,
        strict_funnel_times_duck,
        until_funnel_times_duck,
    )
    from flink_rag_spark.operators.phrases import pmi_collocations_duck
    from flink_rag_spark.operators.dedup import (span_containment_duck,
                                                 span_pairs_duck)
    from flink_rag_spark.operators.diffing import snapshot_diff_duck
    from flink_rag_spark.operators.evaluation import (
        answer_grounding_duck,
        rbo_overlap_duck,
        roc_auc_duck,
    )
    from flink_rag_spark.operators.graph import pagerank_duck
    from flink_rag_spark.operators.percolate import percolate_duck
    from flink_rag_spark.operators.positional import phrase_match_duck
    from flink_rag_spark.operators.validation import fk_integrity_audit_duck
    from flink_rag_spark.operators.integrity import dataset_manifest_duck
    from flink_rag_spark.operators.normalization import normalize_text_duck
    from flink_rag_spark.operators.encoding import (
        encoded_documents_duck,
        vocab_coverage_duck,
    )
    from flink_rag_spark.operators.quality import (
        ngram_novelty_duck,
        unigram_lm_scores_duck,
    )
    from flink_rag_spark.operators.validation import validate_duck
    from flink_rag_spark.operators.profiling import (
        benford_audit_duck,
        inequality_indexes_duck,
        equiwidth_histogram_duck,
        column_entropy_duck,
        gini_concentration_duck,
        hhi_concentration_duck,
        rfm_scores_duck,
        key_skew_profile_duck,
        profile_columns_duck,
        quantile_bins_duck,
        winsorized_stats_duck,
    )
    from flink_rag_spark.operators.anomaly import (
        cusum_first_alarms_duck,
        ewma_control_duck,
        page_hinkley_alarms_duck,
        robust_outliers_duck,
        seasonal_baseline_outliers_duck,
    )
    from flink_rag_spark.operators.association import (
        categorical_association_duck,
        covisitation_topn_duck,
        itemset_pair_rules_duck,
    )
    from flink_rag_spark.operators.graph import (bfs_hops_duck,
                                                 community_labels_duck,
                                                 kcore_nodes_duck,
                                                 link_prediction_duck,
                                                 hits_duck,
                                                 pagerank_duck as pr_duck,
                                                 personalized_pagerank_duck,
                                                 triangle_counts_duck,
                                                 weighted_shortest_paths_duck)
    from flink_rag_spark.operators.hypothesis import (
        ab_proportion_test_duck,
        anova_f_duck,
        brown_forsythe_duck,
        chi2_independence_duck,
        cuped_ab_test_duck,
        cochran_q_duck,
        mcnemar_test_duck,
        cohen_kappa_duck,
        cohens_d_duck,
        cramers_v_duck,
        friedman_test_duck,
        levene_test_duck,
        ordinal_association_duck,
        point_biserial_duck,
        uncertainty_coefficient_duck,
        g_test_independence_duck,
        jarque_bera_duck,
        kendall_tau_duck,
        logrank_test_duck,
        ks_two_sample_duck,
        kruskal_wallis_duck,
        mann_whitney_u_duck,
        mutual_information_duck,
        spearman_corr_duck,
        welch_t_duck,
    )
    from flink_rag_spark.operators.keywords import (
        textrank_keywords_duck,
        tfidf_keywords_duck,
        zipf_fit_duck,
    )
    from flink_rag_spark.operators.profiling import quantile_rollup_duck
    from flink_rag_spark.operators.privacy import (
        k_anonymity_audit_duck,
        l_diversity_audit_duck,
        t_closeness_audit_duck,
    )
    from flink_rag_spark.operators.regression import (
        corr_matrix_duck,
        group_ols_duck,
        mann_kendall_trend_duck,
    )
    from flink_rag_spark.operators.survival import (km_survival_duck,
                                                     nelson_aalen_duck)
    from flink_rag_spark.operators.scd import (as_of_snapshot_duck,
                                               scd2_history_duck)
    from flink_rag_spark.operators.timeseries import (
        dickey_fuller_duck,
        runs_test_duck,
        autocorrelation_duck,
        holt_forecast_duck,
        seasonal_decompose_duck,
        holt_winters_forecast_duck,
        ses_forecast_duck,
        time_decayed_at_latest_duck,
        time_decayed_stats_duck,
    )
    from flink_rag_spark.plans import (
        analytics as A,
        llm,
        relational as R,
        relational2 as R2,
        relational3 as R3,
    )
    from flink_rag_spark.plans.analytics import _ORDERS_REGION_SQL
    from flink_rag_spark.plans.catalog import (
        DP,
        ORACLE_ANTI,
        ORACLE_JSON,
        ORACLE_Q7,
        ORACLE_Q17,
        ORACLE_RAG_ANSWER,
        ORACLE_SEMI,
        ORACLE_SLIDING_BATCH,
        _money,
        _oracle_bm25,
        _oracle_jaccard,
        _oracle_lsh_pairs,
        _oracle_lsh_verified,
        _oracle_rag_hybrid,
    )
    from flink_rag_spark.plans.rag import (
        rag_hybrid_context,
        rag_reranked_answer_oracle,
    )

    from flink_rag_spark.operators.quality import (
        readability_scores_duck,
        repetition_signals_duck,
    )
    from flink_rag_spark.operators.ranking import (
        fuzzy_term_topk_duck,
        lm_dirichlet_topk_duck,
        rm3_expanded_topk_duck,
    )
    from flink_rag_spark.operators.redaction import (
        pii_counts_duck,
        redact_duck,
    )

    # clustering-family mirrors: the codebook is the embeddings of
    # llm.CLUSTER_CENTROID_IDS ordered by id, assignment is rank-1 of
    # rounded cosine with lower-cell tie-break — both replayed exactly
    _cent_ids = ",".join(str(i) for i in llm.CLUSTER_CENTROID_IDS)
    _cent_cte = f"""cent AS (
  SELECT embedding AS cvec, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell
  FROM embeddings WHERE vec_id IN ({_cent_ids}))"""
    _asg_cte = f"""a AS (
  SELECT e.vec_id, e.embedding, c.cell,
         ROUND({cosine_duck('e.embedding', 'c.cvec')}, 6) AS score
  FROM embeddings e CROSS JOIN cent c),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, cell ASC) AS rn
      FROM a),
asg AS (SELECT vec_id, embedding, cell, score FROM r WHERE rn = 1)"""

    def _oracle_curated_pipeline() -> str:
        from flink_rag_spark.operators.curation import (
            DECON_NGRAM,
            quality_filter_duck,
        )
        sh13 = shingle_hashes_duck("text", DECON_NGRAM)
        split = split_assignments_duck(
            "text", {"train": 0.8, "val": 0.1, "test": 0.1})
        return f"""
WITH RECURSIVE q AS (
  SELECT doc_id, text, {quality_filter_duck('text')} FROM documents),
kept AS (SELECT doc_id, text FROM q WHERE keep),
sh AS (SELECT doc_id, {sh13} AS g FROM documents),
bg AS (SELECT DISTINCT unnest(g) AS h FROM sh WHERE doc_id % 10 = 0),
bad AS (SELECT DISTINCT s.doc_id
        FROM (SELECT doc_id, unnest(g) AS h FROM sh
              WHERE doc_id % 10 <> 0) s
        JOIN bg ON s.h = bg.h),
train AS (
  SELECT doc_id, text FROM kept
  WHERE doc_id % 10 <> 0
    AND doc_id NOT IN (SELECT doc_id FROM bad)
    AND ({split}) = 'train'),
docs AS (
  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
         CAST({token_count_duck('text')} AS BIGINT) AS tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 8
                            ORDER BY doc_id) AS rn
  FROM train),
g AS (
  SELECT shard, doc_id, tok, rn,
         CAST(0 AS BIGINT) AS local_pack, tok AS pack_tokens
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.doc_id, d.tok, d.rn,
         CASE WHEN g.pack_tokens + d.tok > 512
              THEN g.local_pack + 1 ELSE g.local_pack END,
         CASE WHEN g.pack_tokens + d.tok > 512
              THEN d.tok ELSE g.pack_tokens + d.tok END
  FROM docs d JOIN g ON d.shard = g.shard AND d.rn = g.rn + 1)
SELECT doc_id, shard, tok,
       CAST(shard AS VARCHAR) || '_' || CAST(local_pack AS VARCHAR)
         AS pack_id,
       pack_tokens
FROM g
"""

    def _oracle_projected_knn() -> str:
        from flink_rag_spark.operators.compression import (
            random_projection_duck,
        )
        rp = random_projection_duck("embedding", llm.RP_OUT_DIM)
        return f"""
WITH pr AS (SELECT vec_id, {rp} AS p FROM embeddings),
q AS (SELECT p AS qp FROM pr WHERE vec_id = 7),
s AS (SELECT pr.vec_id, ROUND({cosine_duck('pr.p', 'q.qp')}, 6) AS pscore
      FROM pr CROSS JOIN q),
r AS (SELECT vec_id, pscore,
             ROW_NUMBER() OVER (ORDER BY pscore DESC, vec_id ASC) AS rank
      FROM s)
SELECT vec_id, pscore, rank FROM r WHERE rank <= 10
"""

    def _oracle_ngram_decon() -> str:
        from flink_rag_spark.operators.curation import DECON_NGRAM
        sh = shingle_hashes_duck("text", DECON_NGRAM)
        return f"""
WITH sh AS (SELECT doc_id, {sh} AS g FROM documents),
bg AS (SELECT DISTINCT unnest(g) AS h FROM sh WHERE doc_id % 10 = 0),
bad AS (SELECT DISTINCT s.doc_id
        FROM (SELECT doc_id, unnest(g) AS h FROM sh
              WHERE doc_id % 10 <> 0) s
        JOIN bg ON s.h = bg.h)
SELECT doc_id, lang, source FROM documents
WHERE doc_id % 10 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM bad)
"""

    def _oracle_kmeans_assign() -> str:
        return f"""
WITH {_cent_cte},
{_asg_cte}
SELECT vec_id, cell, score FROM asg
"""

    def _oracle_semantic_dedup() -> str:
        return f"""
WITH {_cent_cte},
{_asg_cte},
rm AS (SELECT DISTINCT x.vec_id FROM asg x JOIN asg y
       ON x.cell = y.cell AND y.vec_id < x.vec_id
       WHERE ROUND({cosine_duck('x.embedding', 'y.embedding')}, 6)
             >= {llm.SEMANTIC_DEDUP_T})
SELECT vec_id, cell FROM asg
WHERE vec_id NOT IN (SELECT vec_id FROM rm)
"""

    def _oracle_reranked() -> str:
        """Retrieve-then-rerank mirror: cosine top-30 (same rounding and
        tie-break as knn_join), then the local provider's rerank score —
        distinct-token overlap |q∩t|/|q| as an unrounded int/int double
        division, bit-identical to Python's len/len — then top-10 by
        (rr_score, score, vec_id)."""
        from flink_rag_spark.plans.llm import RERANK_K0
        from flink_rag_spark.plans.rag import RAG_ORACLE_QUERY_IDS
        ids = ", ".join(str(i) for i in RAG_ORACLE_QUERY_IDS)
        cos = cosine_duck("e.embedding", "q.query_vec")
        tok = "list_distinct(string_split_regex(trim(lower({s})), '\\s+'))"
        qtok, dtok = tok.format(s="d.text"), tok.format(s="dd.text")
        return f"""
WITH q AS (SELECT vec_id AS question_id, embedding AS query_vec
           FROM embeddings WHERE vec_id IN ({ids})),
scored AS (SELECT q.question_id, e.vec_id, ROUND({cos}, 6) AS score
           FROM embeddings e CROSS JOIN q),
hits AS (SELECT question_id, vec_id, score FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY question_id
                     ORDER BY score DESC, vec_id) AS rnk FROM scored) t
         WHERE rnk <= {RERANK_K0}),
qt AS (SELECT d.doc_id AS question_id, {qtok} AS qtok
       FROM documents d WHERE d.doc_id IN ({ids})),
pairs AS (
  SELECT h.question_id, h.vec_id, h.score,
         len(list_intersect(qt.qtok, {dtok}))
           / CAST(len(qt.qtok) AS DOUBLE) AS rr_score
  FROM hits h
  JOIN qt ON qt.question_id = h.question_id
  JOIN documents dd ON dd.doc_id = h.vec_id)
SELECT question_id, vec_id, rr_score, score, final_rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY question_id
            ORDER BY rr_score DESC, score DESC, vec_id) AS INT)
            AS final_rank
  FROM pairs) t
WHERE final_rank <= 10
"""

    def _oracle_reranked_answer() -> str:
        """End-to-end mirror of rag_reranked_answer_oracle: the reranked
        top-k (same CTEs as _oracle_reranked), context concat ordered by
        the RERANKED rank, two-slot template, md5 chat echo."""
        from flink_rag_spark.plans.catalog import (
            _RAG_T_MID,
            _RAG_T_POST,
            _RAG_T_PRE,
            _sql_str,
        )
        sep = _sql_str(CFG.context_separator)
        return f"""
WITH base AS ({_oracle_reranked()}),
ctx AS (
  SELECT question_id,
         string_agg(d.text, {sep} ORDER BY base.final_rank)
           AS information
  FROM base JOIN documents d ON d.doc_id = base.vec_id
  GROUP BY question_id)
SELECT question_id, question, information, prompt,
       '[answer:' || substr(md5(prompt), 1, 8) || '] '
         || substr(prompt, 1, 200) AS answer
FROM (
  SELECT c.question_id, d.text AS question, c.information,
         {_sql_str(_RAG_T_PRE)} || d.text || {_sql_str(_RAG_T_MID)}
           || c.information || {_sql_str(_RAG_T_POST)} AS prompt
  FROM ctx c JOIN documents d ON d.doc_id = c.question_id) t
"""

    # batch hybrid retrieval mirror: per-query BM25 (unique query terms,
    # global df) + cosine ranks, RRF-fused — same rounding/tie-breaks as
    # operators/ranking.py, so ranks and fused scores agree exactly
    _toks_doc = "string_split_regex(trim(lower(text)), '\\s+')"
    _cos_q = cosine_duck("e.embedding", "q.embedding")
    oracle_hybrid_batch = f"""
WITH queries AS (
  SELECT doc_id AS query_id, text AS query_text FROM documents
  WHERE doc_id < 3),
qterms AS (
  SELECT DISTINCT query_id,
         unnest(string_split_regex(trim(lower(query_text)), '\\s+')) AS term
  FROM queries),
tok AS (SELECT doc_id, unnest({_toks_doc}) AS term FROM documents),
postings AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(len({_toks_doc}) AS DOUBLE) AS dl
       FROM documents),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 AVG(CAST(len({_toks_doc}) AS DOUBLE)) AS avgdl
          FROM documents),
dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
          FROM postings GROUP BY term),
bm AS (
  SELECT qt.query_id, p.doc_id,
         ROUND(SUM(ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (p.tf * (1.2 + 1.0)
                  / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / s.avgdl)))),
               6) AS score
  FROM postings p
  JOIN qterms qt ON qt.term = p.term
  JOIN dl d ON d.doc_id = p.doc_id
  JOIN dfreq f ON f.term = p.term
  CROSS JOIN stats s
  GROUP BY qt.query_id, p.doc_id),
bm_rank AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM bm),
qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
       WHERE vec_id < 3),
cosr AS (
  SELECT q.query_id, e.vec_id AS doc_id, ROUND({_cos_q}, 6) AS score
  FROM embeddings e CROSS JOIN qv q),
cos_rank AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rnk
  FROM cosr),
parts AS (
  SELECT query_id, doc_id, 1.0 / (60 + rnk) AS contrib
  FROM bm_rank WHERE rnk <= 10
  UNION ALL
  SELECT query_id, doc_id, 1.0 / (60 + rnk) FROM cos_rank WHERE rnk <= 10),
fused AS (
  SELECT query_id, doc_id, ROUND(SUM(contrib), 6) AS rrf_score
  FROM parts GROUP BY query_id, doc_id)
SELECT query_id, doc_id, rrf_score, "rank" FROM (
  SELECT query_id, doc_id, rrf_score,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rrf_score DESC, doc_id) AS BIGINT)
           AS "rank"
  FROM fused) t
WHERE "rank" <= 5
"""

    # mirrors plans/llm.pii_redacted_docs' deterministic PII injection
    _pii_counts = ",\n       ".join(pii_counts_duck("text"))
    oracle_pii = f"""
WITH salted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.7' AS text
  FROM documents)
SELECT doc_id,
       {_pii_counts},
       {redact_duck('text')} AS redacted
FROM salted
"""

    # exact interpolated percentiles (both engines: linear interpolation
    # over order statistics) + the expected contract verdicts
    oracle_quantiles = """
SELECT ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
       ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95_exact,
       COUNT(*) AS n,
       TRUE AS p50_in_bound, TRUE AS p95_in_bound
FROM orders
"""

    oracle_agg_status = f"""
SELECT o_orderstatus,
  COUNT(*) AS n_orders,
  COUNT(DISTINCT o_custkey) AS n_customers,
  {_money('o_totalprice')} AS total_price,
  MIN(o_orderdate) AS first_order,
  MAX(o_orderdate) AS last_order
FROM orders GROUP BY o_orderstatus
"""

    oracle_rollup = f"""
SELECT COALESCE(r_name, 'ALL') AS region_name,
       COALESCE(n_name, 'ALL') AS nation_name,
       COUNT(*) AS n_customers,
       {_money('c_acctbal')} AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
"""

    oracle_running = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS running_spend,
  CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2)), 1)
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
    AS prev_price,
  CAST(ROW_NUMBER()
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
    AS order_seq
FROM orders
"""

    oracle_tumbling = f"""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS win_start,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS win_end,
       event_type, COUNT(*) AS n_events, {_money('value')} AS sum_value
FROM events
GROUP BY 1, 2, 3
"""

    cos_q = cosine_duck("embedding", "qv")
    oracle_knn_single = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (SELECT vec_id, ROUND({cos_q}, 6) AS score
           FROM embeddings CROSS JOIN q),
ranked AS (SELECT vec_id, score,
                  ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS rnk
           FROM scored)
SELECT vec_id, score, CAST(rnk AS BIGINT) AS "rank" FROM ranked WHERE rnk <= 10
"""

    oracle_text_quality = f"""
SELECT doc_id,
  CAST({token_count_duck('text')} AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS BIGINT) AS n_bpe_tokens,
  ROUND({punct_ratio_duck('text')}, 6) AS punct_ratio,
  ROUND({stopword_ratio_duck('text', LANG_MARKERS['en'])}, 6) AS en_stop_ratio,
  ROUND(length(text) / greatest({token_count_duck('text')}, 1), 6)
    AS chars_per_token
FROM documents
"""

    codes = sorted(LANG_MARKERS)
    scores = ", ".join(
        f"{stopword_ratio_duck('text', LANG_MARKERS[c])} AS s_{c}" for c in codes)
    best = "greatest(" + ", ".join(f"s_{c}" for c in codes) + ")"
    whens = " ".join(f"WHEN s_{c} = {best} THEN '{c}'" for c in codes)
    oracle_lang_id = f"""
SELECT doc_id, lang,
  CASE WHEN {best} > 0 THEN (CASE {whens} ELSE 'unknown' END)
       ELSE 'unknown' END AS pred_lang
FROM (SELECT doc_id, lang, {scores} FROM documents) t
"""

    sh = shingle_hashes_duck("text", CFG.shingle_size)
    oracle_fingerprints = f"""
SELECT doc_id, {poly_hash_duck('text')} AS fp_full,
       list_min({sh}) AS fp_min_shingle
FROM documents
"""

    oracle_q14 = f"""
SELECT ROUND(100.0 *
  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {DP}
                ELSE CAST(0 AS DECIMAL(30,4)) END) AS DOUBLE)
  / CAST(SUM({DP}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""

    oracle_grouping_sets = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

    oracle_word_count = r"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      FROM documents) t
GROUP BY word
ORDER BY n DESC, word
LIMIT 50
"""

    fp = simhash_fp_duck("th", CFG.simhash_bits, CFG.seed)
    oracle_simhash_docs = f"""
SELECT doc_id, {fp} AS simhash
FROM (SELECT doc_id, {token_hashes_duck('text')} AS th FROM documents) t
"""

    oracle_sql_udf_cosine = f"""
SELECT e.vec_id, ROUND({cosine_duck('e.embedding', 'q.embedding')}, 6) AS score
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
"""

    fold_sum = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                "list_transform(embedding, x -> CAST(x AS DOUBLE))), "
                "(s, x) -> s + x)")
    fold_sq = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
               "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
               "(s, x) -> s + x)")
    oracle_array_stats = f"""
SELECT vec_id,
  CAST(len(embedding) AS BIGINT) AS dims,
  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
  ROUND(sqrt({fold_sq}), 6) AS l2_norm,
  ROUND({fold_sum} / len(embedding), 6) AS mean_val
FROM embeddings
"""

    oracle_global_sort = """
SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
ORDER BY o_totalprice DESC, o_orderkey
"""

    oracle_from_json = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(length(props) AS BIGINT) AS props_len
FROM events
"""

    from flink_rag_spark.operators.curation import (
        hash_bucket_duck,
        hash_sample_duck,
        quality_filter_duck,
    )
    W, S = 32, 24  # window/stride used by plans.llm.chunk_documents_overlap
    oracle_chunks = f"""
SELECT doc_id, i AS chunk_id,
       array_to_string(toks[i*{S}+1 : i*{S}+{W}], ' ') AS chunk_text,
       CAST(len(toks[i*{S}+1 : i*{S}+{W}]) AS BIGINT) AS chunk_tokens
FROM (SELECT doc_id, string_split_regex(trim(coalesce(text, '')), '\\s+') AS toks
      FROM documents) t,
     UNNEST(range(0, CAST(ceil(greatest(len(toks) - {W}, 0) / {S}) AS BIGINT)
                      + 1)) AS u(i)
"""

    oracle_hash_sample = f"""
SELECT doc_id, lang, source,
       {hash_bucket_duck('text')} AS sample_bucket
FROM documents
WHERE {hash_sample_duck('text', 20)}
"""

    oracle_q6 = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(30,4)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

    oracle_q15 = f"""
WITH rev AS (SELECT l_suppkey, CAST(SUM({DP}) AS DOUBLE) AS total_rev
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
             GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
"""

    oracle_q16 = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN pairs ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 49)
GROUP BY p_brand, p_type, p_size
"""

    oracle_q21 = """
SELECT n_name, s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE l1.l_orderkey IN (SELECT o_orderkey FROM orders
                        WHERE o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY n_name, s_name
"""

    # derived partsupp shared by the Q2/Q9/Q11/Q20 oracles — mirrors
    # relational3._derived_supply (raw-double min for cost, exact-decimal
    # sum for availqty)
    ps_cte = """
ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
              MIN(l_extendedprice / l_quantity) AS ps_supplycost,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                AS ps_availqty
       FROM lineitem GROUP BY 1, 2)
"""

    oracle_q2 = f"""
WITH {ps_cte},
eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'EUROPE'),
c AS (SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
      FROM ps JOIN eu ON ps_suppkey = s_suppkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
FROM part JOIN c ON p_partkey = ps_partkey
WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE'
  AND ps_supplycost = (SELECT MIN(c2.ps_supplycost) FROM c c2
                       WHERE c2.ps_partkey = p_partkey)
"""

    # exact integer micro-dollars (see relational3.q9 docstring): round/
    # floor of IDENTICAL doubles is engine-agnostic, integer sums have no
    # fold-order or decimal-cast-tie ambiguity
    oracle_q9 = """
WITH cost AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(FLOOR(l_extendedprice * 100 / l_quantity) AS BIGINT))
           AS cost_cents
  FROM lineitem GROUP BY 1, 2)
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                - cost_cents * CAST(ROUND(l_quantity) AS BIGINT) * 100)
            AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
JOIN cost ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""

    oracle_q11 = f"""
WITH {ps_cte},
v AS (SELECT ps_partkey,
             CAST(ps_supplycost * ps_availqty AS DECIMAL(18,2)) AS val
      FROM ps JOIN supplier ON ps_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7')
SELECT ps_partkey, CAST(SUM(val) AS DOUBLE) AS value
FROM v GROUP BY ps_partkey
HAVING CAST(SUM(val) AS DOUBLE) >
       (SELECT CAST(SUM(val) AS DOUBLE) FROM v) * 0.001
"""

    oracle_q20 = f"""
WITH {ps_cte},
recent AS (SELECT l_partkey AS r_partkey, l_suppkey AS r_suppkey,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    AS recent_qty
           FROM lineitem WHERE EXTRACT(year FROM l_shipdate) >= 1998
           GROUP BY 1, 2),
cand AS (SELECT DISTINCT ps_suppkey
         FROM ps
         JOIN recent ON ps_partkey = r_partkey AND ps_suppkey = r_suppkey
         WHERE ps_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
           AND ps_availqty > 0.5 * recent_qty)
SELECT s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3' AND s_suppkey IN (SELECT ps_suppkey FROM cand)
"""

    oracle_stratified = f"""
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY {poly_hash_duck('text')}, doc_id) AS rn
  FROM documents) t
WHERE rn <= 30
"""

    from flink_rag_spark.plans.catalog import _oracle_lsh_verified
    oracle_contamination = f"""
WITH v AS ({_oracle_lsh_verified()}),
flags AS (SELECT doc_id, {hash_sample_duck('text', 10)} AS in_bench
          FROM documents)
SELECT CASE WHEN fa.in_bench THEN id_a ELSE id_b END AS bench_id,
       CASE WHEN fa.in_bench THEN id_b ELSE id_a END AS train_id,
       jaccard
FROM v
JOIN flags fa ON fa.doc_id = v.id_a
JOIN flags fb ON fb.doc_id = v.id_b
WHERE fa.in_bench <> fb.in_bench
"""

    oracle_quality = f"""
SELECT doc_id, {quality_filter_duck('text')}
FROM documents
"""

    # mirror of operators.multimodal.frame_sample over synthesized videos:
    # indices 0, 10, ... up to n_frames-1 where n_frames = len(text)%240+1
    oracle_frames = """
SELECT doc_id AS media_id, CAST(i AS BIGINT) AS frame_idx
FROM (SELECT doc_id, length(text) % 240 + 1 AS n_frames FROM documents) t,
     UNNEST(range(0, CAST(greatest(n_frames - 1, 0) AS BIGINT) + 1, 10)) AS u(i)
"""

    # arithmetic prediction of the REAL PNG encode→probe round trip
    # (plans/llm.py media_probe_roundtrip): dims are pure functions of
    # doc_id, so a value-hash match proves the worker-encoded bytes are
    # valid PNGs whose IHDR parses back to the intended metadata
    oracle_media_probe = """
SELECT doc_id AS media_id, 'png' AS detected,
       CAST(doc_id % 16 + 1 AS INT) AS width,
       CAST(doc_id % 13 + 1 AS INT) AS height,
       1 AS channels, 8 AS bit_depth
FROM documents WHERE doc_id < 500
"""

    oracle_map_funcs = """
SELECT event_id,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
       CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
"""

    # deterministic weighted sampling: the A-Res key is a pure function of
    # content hash + weight, so the oracle computes the identical key and
    # takes the same top-50 (ln/divide agree to ~1 ulp across engines —
    # far below both the selection margins and the 9-sig-digit canon)
    from flink_rag_spark.operators.curation import weighted_sample_key_duck
    oracle_weighted = f"""
SELECT doc_id, lang, n_chars,
       {weighted_sample_key_duck('text', 'n_chars')} AS samp_key
FROM documents
ORDER BY samp_key DESC, doc_id
LIMIT 50
"""

    def _oracle_diversified() -> str:
        from flink_rag_spark.operators.diversity import (
            cluster_diversified_topk_duck,
        )
        from flink_rag_spark.plans.llm import DIVERSIFY_K, RERANK_K0
        from flink_rag_spark.plans.rag import RAG_ORACLE_QUERY_IDS
        ids = ", ".join(str(i) for i in RAG_ORACLE_QUERY_IDS)
        cos = cosine_duck("e.embedding", "q.query_vec")
        cand_sql = f"""
WITH q AS (SELECT vec_id AS question_id, embedding AS query_vec
           FROM embeddings WHERE vec_id IN ({ids})),
scored AS (SELECT q.question_id, e.vec_id, ROUND({cos}, 6) AS score
           FROM embeddings e CROSS JOIN q),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY question_id
                     ORDER BY score DESC, vec_id) AS rnk FROM scored)
SELECT question_id, vec_id, score FROM ranked WHERE rnk <= {RERANK_K0}"""
        return cluster_diversified_topk_duck(
            cand_sql, _cent_cte, _asg_cte, DIVERSIFY_K,
            query_col="question_id")

    # round-8: retrieval-quality evaluation — the oracle replays the JL
    # projection, BOTH rankings (exact + projected cosine, rounded score,
    # min-id tie break) and the recall/MRR/nDCG folds in SQL
    def _oracle_eval_metrics() -> str:
        from flink_rag_spark.operators.compression import (
            random_projection_duck,
        )
        from flink_rag_spark.operators.evaluation import eval_ranking_duck
        base = f"""
WITH proj AS (
  SELECT vec_id, embedding,
         {random_projection_duck('embedding', llm.RP_OUT_DIM)} AS p
  FROM embeddings),
q AS (SELECT vec_id AS qid, embedding AS qv, p AS qp
      FROM proj WHERE vec_id % {llm.EVAL_QUERY_MOD} = 0),
pairs AS (
  SELECT q.qid AS query_id, e.vec_id AS doc_id,
         ROUND({cosine_duck('e.embedding', 'q.qv')}, 6) AS es,
         ROUND({cosine_duck('e.p', 'q.qp')}, 6) AS ps
  FROM proj e CROSS JOIN q WHERE e.vec_id <> q.qid),
ranked AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY es DESC, doc_id ASC) AS er,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ps DESC, doc_id ASC) AS pr
  FROM pairs)"""
        qrels_sql = (base + f"""
SELECT query_id, doc_id FROM ranked WHERE er <= {llm.EVAL_K}""")
        run_sql = (base + f"""
SELECT query_id, doc_id, pr AS rank FROM ranked WHERE pr <= {llm.EVAL_K}""")
        return eval_ranking_duck(run_sql, qrels_sql, k=llm.EVAL_K)

    from flink_rag_spark.operators.ranking import lm_dirichlet_topk_duck
    _oracle_bm25_15 = _oracle_bm25(15)
    _lm_duck_15 = lm_dirichlet_topk_duck(llm.BM25_QUERY_TERMS, k=15)

    return [
        ("agg_orders_by_status", R.agg_orders_by_status,
         oracle_agg_status, ("agg",)),
        ("rollup_region_nation", R.rollup_region_nation,
         oracle_rollup, ("agg", "rollup")),
        ("window_running_customer_spend", R.window_running_customer_spend,
         oracle_running, ("window",)),
        ("events_tumbling_5min", R.events_tumbling_5min,
         oracle_tumbling, ("window", "stream")),
        ("knn_single_vec0", llm.knn_single_vec0,
         oracle_knn_single, ("similarity",)),
        ("lsh_dup_candidates", llm.lsh_dup_candidates,
         _oracle_lsh_pairs(), ("dedup",)),
        ("text_quality_stats", llm.text_quality_stats,
         oracle_text_quality, ("text",)),
        ("lang_id_heuristic", llm.lang_id_heuristic,
         oracle_lang_id, ("text",)),
        ("doc_fingerprints", llm.doc_fingerprints,
         oracle_fingerprints, ("text",)),
        ("q14_promo_revenue", R2.q14_promo_revenue, oracle_q14, ("agg",)),
        ("q17_small_quantity_revenue", R2.q17_small_quantity_revenue,
         ORACLE_Q17, ("subquery",)),
        ("grouping_sets_orders", R2.grouping_sets_orders,
         oracle_grouping_sets, ("agg",)),
        ("word_count_top50", R2.word_count_top50,
         oracle_word_count, ("text",)),
        ("simhash_docs", llm.simhash_docs, oracle_simhash_docs, ("dedup",)),
        ("sql_udf_cosine", llm.sql_udf_cosine,
         oracle_sql_udf_cosine, ("udf",)),
        ("array_embedding_stats", llm.array_embedding_stats,
         oracle_array_stats, ("scalar", "array")),
        ("global_sort_orders", R3.global_sort_orders,
         oracle_global_sort, ("sort",)),
        ("from_json_events", R3.from_json_events,
         oracle_from_json, ("scalar", "json")),
        ("map_funcs_events", R3.map_funcs_events,
         oracle_map_funcs, ("scalar", "map")),
        ("q6_forecast_revenue", R3.q6_forecast_revenue,
         oracle_q6, ("agg", "scan")),
        ("q15_top_supplier", R3.q15_top_supplier,
         oracle_q15, ("subquery", "argmax")),
        ("q16_supplier_part_counts", R3.q16_supplier_part_counts,
         oracle_q16, ("agg", "distinct")),
        ("q21_suppliers_kept_waiting", R3.q21_suppliers_kept_waiting,
         oracle_q21, ("join", "subquery", "exists")),
        ("q2_min_cost_supplier", R3.q2_min_cost_supplier,
         oracle_q2, ("join", "subquery", "window")),
        ("q9_product_type_profit", R3.q9_product_type_profit,
         oracle_q9, ("join", "agg")),
        ("q11_important_stock", R3.q11_important_stock,
         oracle_q11, ("agg", "subquery")),
        ("q20_excess_stock_suppliers", R3.q20_excess_stock_suppliers,
         oracle_q20, ("join", "subquery", "semi")),
        ("chunk_documents_overlap", llm.chunk_documents_overlap,
         oracle_chunks, ("text", "curation")),
        ("hash_sampled_documents", llm.hash_sampled_documents,
         oracle_hash_sample, ("curation", "sampling")),
        ("quality_filtered_docs", llm.quality_filtered_docs,
         oracle_quality, ("curation", "text")),
        ("stratified_sample_by_lang", llm.stratified_sample_by_lang,
         oracle_stratified, ("curation", "sampling")),
        ("contamination_neardup_overlap", llm.contamination_neardup_overlap,
         oracle_contamination, ("curation", "dedup")),
        ("video_frame_sample", llm.video_frame_sample,
         oracle_frames, ("multimodal",)),
        ("media_probe_roundtrip", llm.media_probe_roundtrip,
         oracle_media_probe, ("multimodal", "codec")),
        ("weighted_sample_docs", llm.weighted_sample_docs,
         oracle_weighted, ("curation", "sampling")),
        # rotated out of the graded window for the round-4 families
        # (gapfill / heavy hitters / bloom decontamination); see the
        # rotation notes in catalog.py _GRADED
        ("semi_join_big_spenders", R.semi_join_big_spenders,
         ORACLE_SEMI, ("join",)),
        ("anti_join_no_orders", R.anti_join_no_orders,
         ORACLE_ANTI, ("join",)),
        ("sliding_window_batch", R2.sliding_window_batch,
         ORACLE_SLIDING_BATCH, ("window", "stream")),
        # rotated out of the graded window in favor of
        # incremental_neardup_batch (all-pairs Jaccard stays covered as the
        # verify sub-stage of the graded lsh_verified_neardup)
        ("jaccard_neardup_pairs", llm.jaccard_neardup_pairs,
         _oracle_jaccard(), ("dedup",)),
        # rotated out of the graded window in favor of dedup_group_assignment
        # (JSON-function coverage stays graded via json_map_events)
        ("json_events_props", R.json_events_props, ORACLE_JSON,
         ("scalar", "agg", "json")),
        # lexical ranking (the BM25 arm of the graded hybrid_rrf_vec7)
        ("bm25_topk_docs", llm.bm25_topk_docs, _oracle_bm25(15),
         ("ranking", "text")),
        # round-10: the OTHER classical lexical model — Dirichlet
        # query-likelihood LM (Lucene LMDirichletSimilarity; Zhai &
        # Lafferty 2004) with absent-term background branches
        # round-11: the same LM scoring answered from the PERSISTED
        # text index (cf from term-pruned postings, |C| from the
        # mergeable total_len) — bit-identical to inline, so it shares
        # the inline oracle (the bm25_topk_indexed_docs discipline)
        ("lm_dirichlet_topk_indexed_docs",
         llm.lm_dirichlet_topk_indexed_docs,
         lm_dirichlet_topk_duck(llm.BM25_QUERY_TERMS, k=15),
         ("ranking", "lm", "index", "serving")),
        ("lm_dirichlet_topk_docs", llm.lm_dirichlet_topk_docs,
         lm_dirichlet_topk_duck(llm.BM25_QUERY_TERMS, k=15),
         ("ranking", "text", "lm")),
        # the persisted-inverted-index READ path under oracle coverage:
        # build in a tempdir, probe, compare to the same inline-BM25 SQL
        # (indexed scoring is bit-identical — r7 verdict item #7)
        ("bm25_topk_indexed_docs", llm.bm25_topk_indexed_docs,
         _oracle_bm25(15), ("ranking", "text", "index")),
        # round-14: OpenSearch-style fuzzy term matching served from
        # the persisted index — length-band + prefix prune +
        # thresholded levenshtein over the postings vocabulary, BM25
        # over the matched variants (ranking.fuzzy_term_topk_indexed)
        ("fuzzy_term_topk_docs", llm.fuzzy_term_topk_docs,
         fuzzy_term_topk_duck(llm.FUZZY_QUERY_TERM, 2, k=15),
         ("ranking", "text", "index", "fuzzy")),
        # batch hybrid retrieval (the OpenSearch hybrid shape for a
        # question batch; per-query BM25 arm + cosine arm, RRF-fused)
        ("hybrid_batch_retrieval", llm.hybrid_batch_retrieval,
         oracle_hybrid_batch, ("similarity", "ranking", "hybrid")),
        # the hybrid RAG assembly chain (fused retrieval → rank-ordered
        # context → prompt), hash-verified end to end
        ("rag_hybrid_context", rag_hybrid_context,
         _oracle_rag_hybrid(), ("rag", "ranking", "hybrid")),
        # quantile-sketch accuracy contract (the approx_distinct trick for
        # percentiles: exact interpolated values hash-verify, the sketch's
        # rank error grades as booleans)
        ("approx_quantiles_prices", R2.approx_quantiles_prices,
         oracle_quantiles, ("agg", "sketch")),
        # Gopher-style repetition quality signals
        ("repetition_signals_docs", llm.repetition_signals_docs,
         repetition_signals_duck(), ("text", "curation", "quality")),
        # round-15: readability scoring — Flesch ease + FK grade from
        # deterministic regexp run counts, per-row projection
        # (quality.readability_scores)
        ("readability_documents", llm.readability_documents,
         readability_scores_duck(), ("text", "curation", "quality")),
        # PII scrub pass (deterministically salted so the redaction and
        # counts are non-trivial on the PII-free synthetic corpus)
        ("pii_redacted_docs", llm.pii_redacted_docs,
         oracle_pii, ("text", "curation", "redaction")),
        # rotated out of the graded window for hybrid_rrf_vec7 (multi-join
        # + agg shape stays graded via q5/q8/q9/q10)
        ("q7_nation_volume", R3.q7_nation_volume, ORACLE_Q7, ("join",)),
        # incrementally-maintained rollup (operators/rollup.py): build on
        # history + append the last day via dynamic partition overwrite;
        # oracle = plain GROUP BY over ALL events (the merge is exact:
        # decimal sums are associative)
        ("rollup_incremental_hourly", R3.rollup_incremental_hourly,
         """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_ts, user_id,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 4) AS avg_value
FROM events GROUP BY 1, 2
""", ("window", "rollup", "incremental")),
        # the cascade over the same store: DAILY served from stored hourly
        # partials alone; oracle recomputes from raw events
        ("rollup_cascade_daily", R3.rollup_cascade_daily, """
SELECT time_bucket(INTERVAL '1 day', ts) AS bucket_ts, user_id,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 4) AS avg_value
FROM events GROUP BY 1, 2
""", ("window", "rollup", "cascade")),
        # round-7: distinct counts as a continuous aggregate — HLL sketch
        # partials maintained incrementally in the rollup store; oracle
        # checks exact per-bucket distincts + the 5% accuracy contract
        ("rollup_hll_users_hourly", R3.rollup_hll_users_hourly, """
SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_ts,
       COUNT(*) AS cnt,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY 1
""", ("window", "rollup", "sketch", "incremental")),
        # sequence packing: per-shard greedy first-fit fold (applyInPandas)
        # replayed exactly by a DuckDB recursive CTE — the sequential
        # operator is value-verified, not just row-counted
        ("packed_documents", llm.packed_documents, f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
         CAST({token_count_duck('text')} AS BIGINT) AS tok,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 8
                            ORDER BY doc_id) AS rn
  FROM documents),
g AS (
  SELECT shard, doc_id, tok, rn,
         CAST(0 AS BIGINT) AS local_pack, tok AS pack_tokens
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.doc_id, d.tok, d.rn,
         CASE WHEN g.pack_tokens + d.tok > 512
              THEN g.local_pack + 1 ELSE g.local_pack END,
         CASE WHEN g.pack_tokens + d.tok > 512
              THEN d.tok ELSE g.pack_tokens + d.tok END
  FROM docs d JOIN g ON d.shard = g.shard AND d.rn = g.rn + 1)
SELECT doc_id, shard, tok,
       CAST(shard AS VARCHAR) || '_' || CAST(local_pack AS VARCHAR)
         AS pack_id,
       pack_tokens
FROM g
""", ("curation", "packing", "udf")),
        # domain mixture sampling (the data-mixing stage): deterministic
        # content-hash thresholds, shared T/p arithmetic with the oracle
        ("mixture_sampled_docs", llm.mixture_sampled_docs,
         mixture_sample_duck(
             "documents", "lang", "text",
             {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1},
             "d.doc_id, d.lang, d.source"),
         ("curation", "sampling", "mixture")),
        # time-weighted average for irregular samples (LOCF weighting,
        # decimal-exact weighted sums)
        ("time_weighted_daily_value", R3.time_weighted_daily_value, """
WITH r AS (
  SELECT user_id, ts, value, event_id,
         time_bucket(INTERVAL '1 day', ts) AS bucket_ts,
         COALESCE(LEAD(ts) OVER (PARTITION BY user_id,
                                 time_bucket(INTERVAL '1 day', ts)
                                 ORDER BY ts, event_id),
                  time_bucket(INTERVAL '1 day', ts) + INTERVAL 1 DAY)
           AS nxt
  FROM events WHERE user_id IS NOT NULL),
d AS (
  SELECT *, CAST(floor(epoch(nxt)) AS BIGINT)
            - CAST(floor(epoch(ts)) AS BIGINT) AS dt
  FROM r)
SELECT user_id, bucket_ts,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2)) * dt) AS DOUBLE)
             / SUM(dt), 4) AS twa,
       COUNT(*) AS n_samples, CAST(SUM(dt) AS BIGINT) AS covered_sec
FROM d GROUP BY user_id, bucket_ts
""", ("window", "timeseries", "twa")),
        # per-column profiling (ANALYZE-style data-quality pass): one
        # aggregate + stack unpivot; oracle = per-column UNION ALL
        ("profile_documents", llm.profile_documents,
         profile_columns_duck("documents",
                              ["doc_id", "lang", "source", "n_chars"]),
         ("agg", "profiling", "quality")),
        # int8 embedding compression: the full quantize→dequantize→score
        # chain recomputed by the oracle + a tolerance contract
        ("quantized_similarity_vec7", llm.quantized_similarity_vec7, f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
s AS (SELECT e.vec_id, e.embedding, q.qv,
             {quantize_scale_duck('e.embedding')} AS sc
      FROM embeddings e, q),
r AS (SELECT vec_id, ROUND(sc, 9) AS qscale,
             ROUND({cosine_duck('embedding', 'qv')}, 6) AS score_exact,
             ROUND({cosine_duck(dequantize_duck('embedding', 'sc'), 'qv')},
                   6) AS score_q
      FROM s)
SELECT vec_id, qscale, score_exact, score_q,
       abs(score_exact - score_q) <= 0.01 AS within_tol
FROM r
""", ("similarity", "compression")),
        # deterministic train/val/test splitting (content-hash thresholds,
        # cross-table aligned); oracle shares the CASE arithmetic
        ("split_documents_tvt", llm.split_documents_tvt, f"""
SELECT doc_id, lang,
       {split_assignments_duck('text',
                               {'train': 0.8, 'val': 0.1, 'test': 0.1})}
         AS split
FROM documents
WHERE {split_assignments_duck('text',
                              {'train': 0.8, 'val': 0.1, 'test': 0.1})}
      IS NOT NULL
""", ("curation", "splitting")),
        # round-7 flagship composition: the curation pipeline END TO END
        # (quality filter → 13-gram decontamination → train split →
        # sequence packing) as one plan, value-verified as a whole
        ("curated_packed_training_set", llm.curated_packed_training_set,
         _oracle_curated_pipeline(),
         ("curation", "pipeline", "packing", "decontamination")),
        # round-7: keyed MERGE (upsert) against the bucketed store —
        # update-wins + inserts, bucket-pruned rewrite; oracle is the
        # CASE/UNION statement of merge semantics
        ("upserted_documents", llm.upserted_documents, """
SELECT doc_id, lang,
       CASE WHEN doc_id % 7 = 0 THEN 'updated' ELSE source END AS source,
       length(text) + CASE WHEN doc_id % 7 = 0 THEN 5 ELSE 0 END
         AS n_chars_out
FROM documents
UNION ALL
SELECT doc_id + 1000000, lang, 'inserted', length(text)
FROM documents WHERE doc_id % 97 = 0
""", ("maintenance", "upsert", "store")),
        # round-7: k-NN in a seeded JL random-projection space — the
        # projection matrix is a pure function of (i, j), so projected
        # vectors, scores and ranks replay exactly
        ("projected_knn_vec7", llm.projected_knn_vec7,
         _oracle_projected_knn(), ("similarity", "compression",
                                   "projection")),
        # round-7: passage-level decontamination — ANY shared 13-gram
        # with the benchmark split drops the train doc (the GPT-3 rule;
        # same rolling shingle hash + padding as the dedup family)
        ("ngram_decontaminated_docs", llm.ngram_decontaminated_docs,
         _oracle_ngram_decon(), ("curation", "decontamination")),
        # round-7: embedding-space clustering + SemDeDup. The codebook is
        # the embeddings of fixed vec_ids (ordered by id), so the oracle
        # reconstructs clustering AND the within-cell pairwise dedup
        # exactly (rounded scores, lower-cell / min-id tie-breaks)
        ("kmeans_assign_cells", llm.kmeans_assign_cells,
         _oracle_kmeans_assign(), ("similarity", "clustering")),
        ("semantic_dedup_docs", llm.semantic_dedup_docs,
         _oracle_semantic_dedup(), ("dedup", "clustering", "semantic")),
        # round-7: exact-substring span dedup (Lee et al. 2022) — pairs
        # sharing any identical 8-token run, distinct-span counts; same
        # rolling shingle hash + hot-span star-reduction both engines
        ("span_neardup_docs", llm.span_neardup_docs,
         span_pairs_duck("documents", "text", "doc_id",
                         llm.SPAN_TOKENS, llm.SPAN_MAX_DOCS),
         ("dedup", "span", "substring")),
        # round-10: doc-in-doc detection — directional span containment
        # (quote/subset signal Jaccard misses; dedup.span_containment)
        ("span_containment_docs", llm.span_containment_docs,
         span_containment_duck("documents", "text", "doc_id",
                               llm.SPAN_TOKENS, llm.SPAN_MAX_DOCS,
                               llm.CONTAINMENT_MIN),
         ("dedup", "span", "containment")),
        # round-7: model-based quality scoring — add-α unigram LM
        # (CCNet perplexity proxy), self-trained; vocabulary order,
        # scoring identity and rounding replay exactly in SQL
        ("unigram_lm_quality", llm.unigram_lm_quality,
         unigram_lm_scores_duck("documents", "text", "doc_id",
                                llm.UNIGRAM_VOCAB, llm.UNIGRAM_ALPHA),
         ("quality", "text", "lm")),
        # round-7: temperature mixture sampling (mT5 α-rule) — shares
        # follow n^0.7, no upsampling; w/S/T/p double arithmetic and the
        # content-hash uniform replay exactly
        ("temperature_mixture_docs", llm.temperature_mixture_docs,
         temperature_mixture_duck("documents", "source", "text",
                                  llm.TEMP_MIXTURE_ALPHA,
                                  "x.doc_id, x.source, x.lang"),
         ("curation", "sampling", "mixture")),
        # round-7: deterministic corpus shuffle — seeded
        # (bucket, pos) coordinates, layout-independent, no global sort
        # round-10: exact-quota stratified sampling — seeded hash rank
        # per stratum (curation.stratified_sample)
        ("stratified_sampled_docs", llm.stratified_sampled_docs,
         stratified_sample_duck("SELECT * FROM documents", ["lang"],
                                llm.STRATA_QUOTA, "doc_id",
                                llm.STRATA_SEED),
         ("curation", "sampling", "window")),
        ("shuffled_documents", llm.shuffled_documents,
         deterministic_shuffle_duck("documents", "doc_id",
                                    llm.SHUFFLE_SEED, llm.SHUFFLE_BUCKETS,
                                    "doc_id"),
         ("curation", "shuffle", "sampling")),
        # round-7: vocabulary induction + token-id encoding — the
        # text-to-trainer-input stage; stable (count DESC, token ASC)
        # ids, UNK=0, position-ordered arrays replay exactly
        ("encoded_documents", llm.encoded_documents,
         encoded_documents_duck("documents", "text", "doc_id",
                                llm.ENCODE_VOCAB, llm.ENCODE_MIN_COUNT),
         ("text", "encoding", "curation")),
        # round-7: rule-based validation report — every row-local rule in
        # ONE aggregate pass + key uniqueness; rules are portable SQL
        # evaluated verbatim by both engines
        ("validated_documents", llm.validated_documents,
         validate_duck("documents", llm.VALIDATION_RULES, "doc_id"),
         ("quality", "validation", "profiling")),
        # round-7: equal-frequency decile binning — exact percentile_cont
        # boundaries broadcast onto one assignment scan
        ("binned_order_prices", R3.binned_order_prices,
         quantile_bins_duck("orders", "o_totalprice", 10, "o_orderkey"),
         ("agg", "stats", "binning")),
        # round-7: retrieve-then-rerank — cosine top-30 per question, the
        # provider rerank seam (deterministic local scorer = distinct-
        # token overlap |q∩t|/|q|, an UNROUNDED int/int division both
        # engines compute bit-identically), final top-10
        ("reranked_retrieval", llm.reranked_retrieval,
         _oracle_reranked(), ("similarity", "ranking", "rerank", "rag")),
        # round-7: the two-stage serving chain END TO END — retrieve(30)
        # → rerank → re-ranked context assembly → template → chat, the
        # whole thing under one value hash
        ("rag_reranked_answer", rag_reranked_answer_oracle,
         _oracle_reranked_answer(), ("rag", "rerank", "ranking")),
        # round-8: the corpus-RELEASE pipeline composed end to end —
        # normalize → novelty filter → train split → manifest, ONE hash
        ("released_corpus_manifest", llm.released_corpus_manifest,
         f"""
WITH normalized AS (
  SELECT doc_id, {normalize_text_duck('text')} AS text FROM documents),
nov AS ({ngram_novelty_duck('normalized', 'text', 'doc_id',
                            llm.NOVELTY_NGRAM)}),
kept AS (
  SELECT n.doc_id, n.text FROM normalized n
  LEFT JOIN nov ON nov.doc_id = n.doc_id
  WHERE COALESCE(nov.dup_fraction, 0.0) <= {llm.RELEASE_DUP_MAX!r}),
train AS (
  SELECT doc_id, text FROM kept
  WHERE ({split_assignments_duck('text',
                                 {'train': 0.8, 'val': 0.1,
                                  'test': 0.1})}) = 'train')
SELECT * FROM ({dataset_manifest_duck('train', 'doc_id', 'text',
                                      llm.MANIFEST_BUCKETS)})""",
         ("curation", "pipeline", "integrity", "normalization")),
        # round-8: per-doc n-gram novelty — same shingles, same
        # distinct-per-doc sets, same df fold in both engines
        ("ngram_novelty_docs", llm.ngram_novelty_docs,
         ngram_novelty_duck("documents", "text", "doc_id",
                            llm.NOVELTY_NGRAM),
         ("quality", "dedup", "text")),
        # round-8: multi-benchmark decontamination report — same shingle
        # hashes, same distinct-gram sets, same per-bench aggregates
        ("decontamination_report_docs", llm.decontamination_report_docs,
         f"""
WITH b AS (
  SELECT CASE WHEN doc_id % 10 = 0 THEN 'benchA' ELSE 'benchB' END
           AS bench_id, doc_id, text
  FROM documents WHERE doc_id % 5 = 0),
t AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
bg AS (SELECT DISTINCT bench_id, g
       FROM (SELECT bench_id,
                    unnest(list_distinct({shingle_hashes_duck('text', 13)}))
                      AS g FROM b)),
tg AS (SELECT doc_id,
              unnest(list_distinct({shingle_hashes_duck('text', 13)})) AS g
       FROM t),
hits AS (SELECT bg.bench_id, tg.doc_id, tg.g
         FROM tg JOIN bg ON tg.g = bg.g),
pb AS (SELECT bench_id,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_contaminated,
              CAST(COUNT(DISTINCT g) AS BIGINT) AS n_hit_grams
       FROM hits GROUP BY 1),
bs AS (SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS n_bench_docs
       FROM b GROUP BY 1),
gs AS (SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS n_bench_grams
       FROM bg GROUP BY 1),
tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM t)
SELECT bs.bench_id, n_bench_docs,
       CAST(COALESCE(n_bench_grams, 0) AS BIGINT) AS n_bench_grams,
       CAST(COALESCE(n_hit_grams, 0) AS BIGINT) AS n_hit_grams,
       CAST(COALESCE(n_contaminated, 0) AS BIGINT) AS n_contaminated,
       n_train,
       ROUND(COALESCE(n_contaminated, 0) / CAST(n_train AS DOUBLE), 6)
         AS contamination_rate
FROM bs LEFT JOIN gs USING (bench_id) LEFT JOIN pb USING (bench_id), tt
""",
         ("curation", "decontamination", "profiling")),
        # round-8: curriculum ordering — LM-quality bands (broadcast
        # quantile boundaries, band 1 = best) + seeded within-band
        # shuffle coordinates; all three composed stages replay in SQL
        ("curriculum_ordered_docs", llm.curriculum_ordered_docs,
         f"""
WITH lm AS ({unigram_lm_scores_duck('documents', 'text', 'doc_id',
                                    llm.UNIGRAM_VOCAB,
                                    llm.UNIGRAM_ALPHA)}),
sc AS (SELECT doc_id, avg_logprob FROM lm),
banded AS (
  SELECT doc_id, avg_logprob,
         CAST({llm.CURRICULUM_BANDS} + 1 - _qb AS INT) AS band
  FROM ({quantile_bins_duck('sc', 'avg_logprob', llm.CURRICULUM_BANDS,
                            'doc_id, avg_logprob', '_qb')}))
SELECT doc_id, avg_logprob, band, shuffle_bucket, shuffle_pos
FROM ({deterministic_shuffle_duck('banded', 'doc_id', llm.SHUFFLE_SEED,
                                  llm.SHUFFLE_BUCKETS,
                                  'doc_id, avg_logprob, band')})""",
         ("curation", "curriculum", "quality", "shuffle")),
        # round-8: join-key skew diagnostic — same rank orders, same
        # exact-integer Gini numerator, same rounding in both engines
        ("skew_profile_orders", R3.skew_profile_orders,
         key_skew_profile_duck("orders", "o_custkey", 20),
         ("agg", "profiling", "skew")),
        # round-8: winsorized per-group robust stats — quantile_cont ≡
        # Spark interpolated percentile, same clip + sample stddev
        ("winsorized_order_prices", R3.winsorized_order_prices,
         winsorized_stats_duck("orders", "o_totalprice",
                               "o_orderpriority"),
         ("agg", "profiling", "stats")),
        # round-8: text normalization — the oracle derives the SAME
        # dirtied input and replays the canonicalization chain (regex
        # subset chosen so Java regex and RE2 agree)
        ("normalized_documents", llm.normalized_documents,
         f"""
WITH s1 AS (SELECT doc_id, text,
  CASE WHEN doc_id % 3 = 0 THEN upper(text) ELSE text END AS s
  FROM documents),
s2 AS (SELECT doc_id, text,
  CASE WHEN doc_id % 5 = 0 THEN chr(9) || ' ' || s || '  ' ELSE s END AS s
  FROM s1),
dirty AS (SELECT doc_id, text,
  CASE WHEN doc_id % 7 = 0
       THEN regexp_replace(s, ' ', '   ', 'g') ELSE s END AS s
  FROM s2)
SELECT doc_id, {normalize_text_duck('s')} AS norm_text,
       s <> {normalize_text_duck('s')} AS changed,
       {normalize_text_duck('s')} = {normalize_text_duck('text')}
         AS roundtrip_ok
FROM dirty""",
         ("text", "normalization", "curation")),
        # round-8: dataset integrity manifest — per-bucket counts +
        # content-hash XOR + key range; XOR/COUNT/SUM replay exactly
        ("dataset_manifest_docs", llm.dataset_manifest_docs,
         dataset_manifest_duck("documents", "doc_id", "text",
                               llm.MANIFEST_BUCKETS),
         ("maintenance", "integrity", "agg")),
        # round-8: incremental manifest maintenance — the oracle is a
        # FROM-SCRATCH rebuild over the surviving rows, so the graded
        # hash proves incremental folds (add + XOR-remove) ≡ rebuild
        ("incremental_manifest_docs", llm.incremental_manifest_docs,
         f"""
WITH remaining AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0)
SELECT bucket, n_rows, content_xor, total_len
FROM ({dataset_manifest_duck('remaining', 'doc_id', 'text',
                             llm.MANIFEST_BUCKETS)})
ORDER BY bucket""",
         ("maintenance", "integrity", "incremental")),
        # round-8: snapshot diff / CDC — the oracle derives the same next
        # version and replays the full-outer-join delta with identical
        # null-safe semantics and changed-column order
        ("snapshot_diff_docs", llm.snapshot_diff_docs,
         snapshot_diff_duck(
             "SELECT doc_id, lang, source, n_chars FROM documents",
             """SELECT doc_id,
       CASE WHEN doc_id % 11 = 0 THEN 'xx' ELSE lang END AS lang,
       source,
       CASE WHEN doc_id % 11 = 0 THEN n_chars + 5 ELSE n_chars
       END AS n_chars
FROM documents WHERE doc_id % 13 <> 0
UNION ALL
SELECT doc_id + 1000000, lang, source, n_chars
FROM documents WHERE doc_id % 17 = 0""",
             ["doc_id"], ["lang", "source", "n_chars"]),
         ("maintenance", "diff", "cdc")),
        # round-8: retrieval evaluation as an engine query — recall@10 /
        # MRR@10 / nDCG@10 of the JL-projected ranking vs exact cosine
        # ground truth, both rankings + metric folds replayed in SQL
        ("retrieval_eval_metrics", llm.retrieval_eval_metrics,
         _oracle_eval_metrics(), ("similarity", "eval", "ranking")),
        # round-8: RM3 pseudo-relevance feedback — the ENTIRE
        # data-dependent chain (feedback top-10, term election, weighted
        # second pass) replays in SQL
        ("rm3_expanded_bm25_docs", llm.rm3_expanded_bm25_docs,
         rm3_expanded_topk_duck(llm.BM25_QUERY_TERMS, k=15),
         ("ranking", "text", "feedback")),
        # round-8: cluster-diversified retrieval — the oracle shares the
        # clustering family's cent/asg CTEs and the rerank family's
        # first-stage top-30, then replays both diversification windows
        ("diversified_retrieval", llm.diversified_retrieval,
         _oracle_diversified(), ("similarity", "ranking", "diversity")),
        # round-8c: corpus collocation mining — PMI over adjacent word
        # pairs, min-count floored, full formula + tie-breaks replayed
        ("pmi_collocations_docs", llm.pmi_collocations_docs,
         pmi_collocations_duck("text", llm.PMI_MIN_COUNT, llm.PMI_TOP_N),
         ("text", "phrases", "agg")),
        # round-8c: tokenizer-coverage audit — vocab induction + per-doc
        # OOV fold, one SQL replay of both stages
        ("vocab_coverage_docs", llm.vocab_coverage_docs,
         vocab_coverage_duck("documents", "text", "doc_id",
                             llm.COVERAGE_VOCAB_SIZE,
                             llm.COVERAGE_MIN_COUNT),
         ("text", "encoding", "quality")),
        # round-8c: PSI drift between the two event_id parities — bin
        # boundaries, counts, ε floors, and the folded total all replay
        ("psi_value_drift", llm.psi_value_drift,
         psi_drift_duck("SELECT value FROM events WHERE event_id % 2 = 0",
                        "SELECT value FROM events WHERE event_id % 2 = 1",
                        "value", 10),
         ("agg", "drift", "profiling")),
        # round-8c: contrastive hard-negative mining — label-filtered
        # exact cosine top-k per fixed anchor, brute-force SQL replay
        ("hard_negatives_vec7", llm.hard_negatives_vec7,
         hard_negatives_duck(llm.HN_ANCHOR_IDS, k=llm.HN_K),
         ("similarity", "contrastive", "training")),
        # round-8c: fuzzy (MinHash-Jaccard) benchmark decontamination —
        # cross-corpus LSH candidates + exact-Jaccard verify + anti join,
        # entire chain replayed over the split predicates
        ("fuzzy_decontaminated_docs", llm.fuzzy_decontaminated_docs,
         fuzzy_decontaminate_duck("doc_id % 10 != 0", "doc_id % 10 = 0",
                                  llm.FUZZY_DECON_T,
                                  "doc_id, lang, source"),
         ("dedup", "curation", "decontamination")),
        # round-8c: blocked fuzzy string self-join — last-token blocking
        # + thresholded Levenshtein verify over the name vocabulary
        ("fuzzy_part_name_matches", llm.fuzzy_part_name_matches,
         fuzzy_self_pairs_duck("part", "p_name",
                               llm.FUZZY_MATCH_DISTANCE,
                               "string_split({s}, ' ')[-1]"),
         ("join", "linkage", "fuzzy")),
        # round-8d: CEP-style sequence funnel — FlinkCEP followedBy /
        # MATCH_RECOGNIZE earliest-match semantics as stacked running-min
        # window layers over ONE exchange; within-anchor time bound
        ("funnel_view_click_purchase", llm.funnel_view_click_purchase,
         funnel_summary_duck(llm.FUNNEL_STEPS, llm.FUNNEL_WITHIN_SECONDS),
         ("streaming", "cep", "window")),
        # round-9: quantified/Kleene CEP steps — FlinkCEP timesOrMore /
        # MATCH_RECOGNIZE A B{3,} C, desugared into extra running-min
        # layers over the flat funnel's single exchange
        ("kleene_funnel_users", llm.kleene_funnel_users,
         quantified_funnel_times_duck(llm.KLEENE_STEPS,
                                      llm.KLEENE_WITHIN_SECONDS),
         ("streaming", "cep", "window", "kleene")),
        # round-8d: order-1 Markov transition matrix over per-user
        # event streams — lag window + |types|²-bounded aggregate
        ("event_transition_matrix", llm.event_transition_matrix,
         event_transitions_duck(), ("streaming", "cep", "agg")),
        # round-8d: weekly retention cohorts — first-signup anchors,
        # key-partitioned activity join, exact distinct actives
        ("retention_weekly_cohorts", llm.retention_weekly_cohorts,
         cohort_retention_duck(), ("streaming", "cohort", "agg")),
        # round-8d: DSIR importance-weighted data selection — two
        # B-bounded hashed-n-gram estimators, broadcast λ table,
        # deterministic top-n (the paper's Gumbel twist documented)
        ("dsir_selected_docs", llm.dsir_selected_docs,
         dsir_select_duck("1=1", "lang = 'en'", llm.DSIR_TOP_N,
                          n_buckets=llm.DSIR_BUCKETS,
                          keep_cols="lang, source"),
         ("curation", "importance", "training")),
        # round-8d: fixed-iteration PageRank — the oracle unrolls all
        # power iterations as chained CTEs (dangling mass, degree
        # division, damping), value-checking the ITERATIVE computation
        ("pagerank_copurchase", llm.pagerank_copurchase,
         pagerank_duck(iters=llm.PAGERANK_ITERS, edges_sql=
             "SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src, "
             "'s' || CAST(l_suppkey AS VARCHAR) AS dst "
             "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
             "UNION "
             "SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR), "
             "'c' || CAST(o_custkey AS VARCHAR) "
             "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"),
         ("graph", "iterative", "join")),
        # round-8d: end-to-end entity resolution — fuzzy blocking join
        # → connected components (min-id survivor) → labeled entities;
        # the oracle replays the components via a RECURSIVE
        # reachability CTE, so the iterative step is value-checked
        ("resolved_part_entities", llm.resolved_part_entities,
         f"""
WITH RECURSIVE
prs AS ({fuzzy_self_pairs_duck("part", "p_name",
                               llm.FUZZY_MATCH_DISTANCE,
                               "string_split({s}, ' ')[-1]")}),
nodes AS (SELECT DISTINCT p_name AS name FROM part),
edges AS (SELECT str_a AS u, str_b AS v FROM prs
          UNION SELECT str_b, str_a FROM prs),
walk(node, rep) AS (
  SELECT name, name FROM nodes
  UNION
  SELECT e.v, walk.rep FROM walk JOIN edges e ON e.u = walk.node),
lbl AS (SELECT node, MIN(rep) AS entity_rep FROM walk GROUP BY node)
SELECT node AS name, entity_rep,
       COUNT(*) OVER (PARTITION BY entity_rep) AS n_variants
FROM lbl
""",
         ("join", "linkage", "graph")),
        # round-9: golden-record survivorship composed onto the
        # resolved entities (linkage.golden_records) — the oracle
        # replays recursive components + every merge rule
        ("golden_part_entities", llm.golden_part_entities,
         golden_records_duck(
             _golden_part_labeled_sql(), "entity_rep",
             llm.GOLDEN_PART_RULES),
         ("linkage", "survivorship", "agg")),
        # round-8d: percolation / reverse search — standing queries
        # matched against every doc: one tokenize scan + broadcast join
        ("percolated_documents", llm.percolated_documents,
         percolate_duck(llm.PERCOLATE_QUERIES),
         ("text", "percolate", "alerting")),
        # round-9: positional phrase search — adjacent in-order token
        # runs via ONE anchor-count aggregate (operators/positional.py)
        ("phrase_matched_documents", llm.phrase_matched_documents,
         phrase_match_duck(
             "SELECT doc_id, text FROM documents",
             "SELECT * FROM (VALUES "
             + ", ".join(f"({i}, '{p}')" for i, p in llm.PHRASE_QUERIES)
             + ") AS v(phrase_id, phrase)"),
         ("text", "phrase", "positional")),
        # round-8d: ROC-AUC without a global sort — per-score histogram
        # + one cumulative window, Mann-Whitney tie correction; the
        # score is cosine-to-the-class-0-centroid (AUC ≈ 0.79 — real
        # separation, unlike text-vs-lang in this synthetic corpus)
        ("auc_label_centroid", llm.auc_label_centroid,
         roc_auc_duck(f"""
SELECT ROUND({cosine_duck('e.embedding', 'c.cent')}, 6) AS s,
       (e.label = {llm.AUC_LABEL}) AS y
FROM embeddings e CROSS JOIN (
  SELECT list(mu ORDER BY dim) AS cent FROM (
    SELECT n.i AS dim, AVG(embedding[n.i]) AS mu
    FROM embeddings, (SELECT unnest(range(1, 65)) AS i) n
    WHERE label = {llm.AUC_LABEL} GROUP BY 1)) c"""),
         ("eval", "agg", "similarity")),
        # round-8d: BPE tokenizer induction — iterative merge learning
        # (each step depends on the last argmax), rows-only by the
        # driver contract; exact merge sequence pinned by the
        # pure-python replica in tests/test_round8d_ops.py
        ("bpe_merges_docs", llm.bpe_merges_docs, None,
         ("text", "encoding", "training")),
        # round-8e: per-group OLS trend from exact sums — the
        # REGR_SLOPE/REGR_R2 family (operators/regression.py)
        ("trend_nation_order_value", A.trend_nation_order_value,
         group_ols_duck(
             "SELECT n_name, o_orderdate, o_totalprice FROM ("
             + _ORDERS_REGION_SQL + ")",
             ["n_name"],
             "datediff('day', DATE '1970-01-01', o_orderdate)",
             "o_totalprice"),
         ("agg", "regression", "stats")),
        # round-8e: SCD Type-2 validity intervals from a change log —
        # gaps-and-islands fold, ONE key exchange (operators/scd.py)
        ("scd2_customer_status_history", A.scd2_customer_status_history,
         scd2_history_duck("SELECT * FROM orders", "o_custkey",
                           "o_orderdate", "o_orderstatus", "o_orderkey"),
         ("window", "scd", "history")),
        # round-9: time-travel read over the SCD2 history — the
        # point-in-time filter under the half-open interval contract
        ("customer_status_as_of", A.customer_status_as_of,
         as_of_snapshot_duck(
             scd2_history_duck("SELECT * FROM orders", "o_custkey",
                               "o_orderdate", "o_orderstatus",
                               "o_orderkey"),
             A.SCD2_AS_OF),
         ("scd", "timetravel", "scan")),
        # round-8e: two-sample KS test via a DISTRIBUTED ECDF — range-
        # partitioned prefix sums, no global window
        # (operators/hypothesis.py)
        ("ks_order_price_regions", A.ks_order_price_regions,
         ks_two_sample_duck(
             "SELECT o_totalprice FROM (" + _ORDERS_REGION_SQL
             + ") WHERE r_name = 'EUROPE'",
             "SELECT o_totalprice FROM (" + _ORDERS_REGION_SQL
             + ") WHERE r_name = 'ASIA'",
             "o_totalprice"),
         ("stats", "hypothesis", "drift")),
        # round-8e: exponential time-decay aggregates — recency
        # weighting from a fixed reference instant
        # (operators/timeseries.py time_decayed_stats)
        ("decayed_user_event_value", A.decayed_user_event_value,
         time_decayed_stats_duck("SELECT * FROM events", ["user_id"],
                                 "ts", "value", A.DECAY_REF_TS,
                                 A.DECAY_HALF_LIFE_DAYS),
         ("agg", "timeseries", "decay")),
        # round-8e: categorical association grid — contingency table
        # with expected / PMI / chi-square terms, empty cells included
        # (operators/association.py)
        ("association_segment_region", A.association_segment_region,
         categorical_association_duck(
             """SELECT c.c_mktsegment, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey""",
             "c_mktsegment", "r_name"),
         ("agg", "stats", "association")),
        # round-8e: the anchored-decay twin — per-key reference instant
        # (= the streaming decay monitor's converged state,
        # streaming/decay.py)
        ("decayed_at_latest_user_value", A.decayed_at_latest_user_value,
         time_decayed_at_latest_duck("SELECT * FROM events", ["user_id"],
                                     "ts", "value",
                                     A.DECAY_HALF_LIFE_DAYS),
         ("agg", "timeseries", "decay", "stream")),
        # round-8e: robust median/MAD outlier detection — the
        # quality-gate rule that survives the outliers it hunts
        # (operators/anomaly.py)
        ("event_value_outliers", A.event_value_outliers,
         robust_outliers_duck("SELECT * FROM events", ["event_type"],
                              "value"),
         ("stats", "anomaly", "quality")),
        # round-8e: generation-side RAG eval — token-overlap grounding
        # of the full chain's answers against their retrieved contexts
        # (operators/evaluation.py answer_grounding); the oracle replays
        # retrieval + assembly + chat + the metric
        ("rag_answer_grounding", A.rag_answer_grounding,
         answer_grounding_duck(ORACLE_RAG_ANSWER, "question_id",
                               "answer", "information"),
         ("rag", "eval", "text")),
        # round-8e: incrementally-maintained JOIN view — fact appends
        # (replay-idempotent markers) + a dimension update re-derived
        # from the view itself; oracle = from-scratch join with the dim
        # change as a CASE (operators/ivm.py)
        ("ivm_enriched_orders", A.ivm_enriched_orders,
         A.ORACLE_IVM_ENRICHED, ("ivm", "join", "incremental")),
        # round-9: fact-side UPSERT maintenance — keyed replace with
        # cross-partition row moves + inserts, replayed to prove keyed
        # idempotency; oracle = from-scratch join over the modified set
        ("ivm_upserted_orders", A.ivm_upserted_orders,
         A.ORACLE_IVM_UPSERT, ("ivm", "join", "incremental", "upsert")),
        # round-10: fact-side DELETE — the fourth delta class, the
        # view's RTBF arm; purge replayed to prove idempotency
        # (operators/ivm.py delete_facts)
        ("ivm_deleted_orders", A.ivm_deleted_orders,
         A.ORACLE_IVM_DELETE, ("ivm", "join", "incremental", "delete")),
        # round-8e wave 2: degree-oriented triangle counting + local
        # clustering coefficient (operators/graph.py triangle_counts;
        # the oracle counts via the canonical three-way join)
        ("part_triangle_stats", A.part_triangle_stats,
         triangle_counts_duck(A._TRIANGLE_EDGES_SQL),
         ("graph", "join", "analytics")),
        # round-9: deterministic synchronous label propagation — the
        # oracle unrolls every most-frequent-neighbor round as chained
        # MATERIALIZED CTEs (graph.community_labels_duck)
        ("part_communities", A.part_communities,
         community_labels_duck(A._TRIANGLE_EDGES_SQL),
         ("graph", "iterative", "analytics")),
        # round-10: quantile partials in continuous aggregates — the
        # percentile twin of the HLL rollup: hourly quantized bins
        # cascade to daily by summation, rank-picked finalize
        # (profiling.quantile_partials/quantiles_from_bins)
        ("daily_value_quantiles", A.daily_value_quantiles,
         quantile_rollup_duck(
             "SELECT ts, value FROM events", "ts", "value",
             "time_bucket(INTERVAL 1 day, {ts})", A.QROLL_QS,
             A.QROLL_STEP),
         ("rollup", "quantile", "incremental")),
        # round-10: personalized PageRank — seed-concentrated teleport
        # incl. dangling restart; all four iterations unrolled in the
        # oracle (graph.personalized_pagerank)
        ("part_ppr_relevance", A.part_ppr_relevance,
         personalized_pagerank_duck(A._PPR_EDGES_SQL, A.BFS_SOURCES,
                                    iters=A.PPR_ITERS),
         ("graph", "iterative", "recommendation")),
        # round-11: edge-weighted PageRank — pr·w/Σw contributions over
        # the co-purchase strengths; integer weights keep strength sums
        # exact; all four iterations unrolled (graph.pagerank weight=)
        ("part_pagerank_weighted", A.part_pagerank_weighted,
         pr_duck(A._WPR_EDGES_SQL, iters=A.WPR_ITERS, weighted=True),
         ("graph", "iterative", "weighted")),
        # round-11: bounded-round min-plus shortest paths — cheapest
        # ≤3-edge path under inverse co-purchase strength, relaxation
        # rounds unrolled (graph.weighted_shortest_paths)
        ("part_weighted_distances", A.part_weighted_distances,
         weighted_shortest_paths_duck(A._WSP_EDGES_SQL, A.BFS_SOURCES,
                                      A.WSP_ROUNDS),
         ("graph", "iterative", "weighted")),
        # round-11: weighted PPR — seed teleport over strength-
        # proportional rank flow (the weighted twin of ppr_relevance)
        ("part_ppr_weighted", A.part_ppr_weighted,
         personalized_pagerank_duck(A._WPR_EDGES_SQL, A.BFS_SOURCES,
                                    iters=A.WPR_ITERS, weighted=True),
         ("graph", "iterative", "weighted")),
        # round-11: weighted LPA — votes sum co-purchase strengths;
        # integer weights keep the argmax order exact
        ("part_communities_weighted", A.part_communities_weighted,
         community_labels_duck(A._WEDGES_SQL, weighted=True),
         ("graph", "iterative", "weighted")),
        # round-10: link prediction — common neighbors + Adamic–Adar
        # over absent edges, hub-capped wedge enumeration, DECIMAL-
        # quantized AA terms (graph.link_prediction)
        ("part_link_prediction", A.part_link_prediction,
         link_prediction_duck(A._TRIANGLE_EDGES_SQL, A.LINKPRED_TOP_N),
         ("graph", "join", "recommendation")),
        # round-10: multi-source BFS hop distances — frontier rounds
        # unrolled as MATERIALIZED CTEs (graph.bfs_hops)
        ("part_bfs_hops", A.part_bfs_hops,
         bfs_hops_duck(A._TRIANGLE_EDGES_SQL, A.BFS_SOURCES,
                       A.BFS_MAX_HOPS),
         ("graph", "iterative", "analytics")),
        # round-10: k-core decomposition — synchronous peel rounds,
        # deterministic (pure degree predicate, no tie-breaks), oracle
        # unrolls every round as MATERIALIZED CTEs (graph.kcore_nodes)
        ("part_kcore", A.part_kcore,
         kcore_nodes_duck(A._TRIANGLE_EDGES_SQL, A.KCORE_K),
         ("graph", "iterative", "analytics")),
        # round-10: l-diversity audit — k-anonymity's sensitive-value
        # complement on the same QI (privacy.l_diversity_audit)
        ("l_diversity_customers", A.l_diversity_customers,
         l_diversity_audit_duck(A._L_DIVERSITY_SQL,
                                ["c_mktsegment", "n_name"], "acct_band",
                                A.L_DIVERSITY_L),
         ("privacy", "agg", "audit")),
        # round-9: CUSUM change-point detection — the max(0, s+d)
        # recurrence as its running-sum − running-min closed form over
        # DECIMAL-quantized deviations (anomaly.cusum_first_alarms)
        # round-9: profiling + mining wave — equi-width histogram with
        # materialized empty bins, exact-sum Pearson matrix, and the
        # depth-2 Apriori basket rules
        ("order_value_histogram", A.order_value_histogram,
         equiwidth_histogram_duck("SELECT o_totalprice FROM orders",
                                  "o_totalprice", A.HIST_BINS,
                                  A.HIST_LO, A.HIST_HI),
         ("profiling", "agg", "histogram")),
        ("lineitem_corr_matrix", A.lineitem_corr_matrix,
         corr_matrix_duck("SELECT * FROM lineitem", A.CORR_COLS),
         ("stats", "agg", "profiling")),
        # round-10: two-proportion z-test (A/B readout) — one
        # conditional-count aggregate; verdict at the passed critical
        # value since neither engine ships erf
        # (hypothesis.ab_proportion_test)
        ("ab_user_conversion", A.ab_user_conversion,
         ab_proportion_test_duck(A._AB_USERS_SQL, "grp", "converted",
                                 0, 1),
         ("hypothesis", "agg", "experiment")),
        # round-10: item-item co-visitation recommendations — the
        # pair-rules machinery under a popularity-normalized cosine
        # + per-item top-N (association.covisitation_topn)
        ("part_covisitation", A.part_covisitation,
         covisitation_topn_duck("SELECT l_orderkey, l_partkey "
                                "FROM lineitem",
                                "l_orderkey", "l_partkey",
                                A.COVIS_TOP_N, A.RULES_MIN_PAIR),
         ("association", "mining", "recommendation")),
        ("basket_pair_rules", A.basket_pair_rules,
         itemset_pair_rules_duck("SELECT l_orderkey, l_partkey "
                                 "FROM lineitem",
                                 "l_orderkey", "l_partkey",
                                 A.RULES_MIN_PAIR),
         ("association", "mining", "join")),
        # round-9: explicit sessionization (per-event ids folded to
        # session summaries) and the cross-table FK orphan audit
        ("user_sessions", A.user_sessions,
         session_stats_duck(A.SESSION_GAP_S),
         ("sequence", "session", "window")),
        ("fk_audit_all", A.fk_audit_all,
         fk_integrity_audit_duck(A.FK_RELATIONS),
         ("validation", "join", "audit")),
        # round-10: CEP negation (FlinkCEP notFollowedBy) — absence
        # steps as anti-window layers over the funnel's single
        # exchange; violation is monotone, so validating the earliest
        # completion against the earliest forbidden instant decides the
        # pattern exactly (operators/sequences.py negated_funnel_times)
        ("negated_funnel_users", A.negated_funnel_users,
         negated_funnel_times_duck(A.NEG_FUNNEL_STEPS,
                                   A.NEG_FUNNEL_GAPS),
         ("streaming", "cep", "window", "negation")),
        # round-11: seasonal (hour-of-day) baseline anomalies — exact
        # decimal phase moments, quotient z, rounded-z threshold on
        # both sides (operators/anomaly.py seasonal_baseline_outliers)
        ("hourly_value_anomalies", A.hourly_value_anomalies,
         seasonal_baseline_outliers_duck(
             "SELECT event_id, ts, user_id, value FROM events",
             "ts", "value", phase="hour"),
         ("anomaly", "seasonal", "analytics")),
        # round-11: simple-exponential-smoothing forecast — the closed
        # form makes the recurrence one window + one aggregate; per-term
        # DECIMAL quantization absorbs POWER's last-ulp engine drift
        # (operators/timeseries.py ses_forecast)
        ("user_value_ses_forecast", A.user_value_ses_forecast,
         ses_forecast_duck(
             "SELECT user_id, ts, event_id, value FROM events "
             "WHERE value IS NOT NULL",
             ["user_id"], "ts", "value", "event_id"),
         ("timeseries", "forecast", "window")),
        # round-12: Holt linear-trend forecast — level + trend as TWO
        # Python-precomputed decimal weight tables over the SES plan
        # shape (operators/timeseries.py holt_forecast)
        ("user_value_holt_forecast", A.user_value_holt_forecast,
         holt_forecast_duck(
             "SELECT user_id, ts, event_id, value FROM events "
             "WHERE value IS NOT NULL",
             ["user_id"], "ts", "value", "event_id"),
         ("timeseries", "forecast", "window")),
        # round-12: additive Holt-Winters — level+trend+seasonal via
        # TWO Python-precomputed decimal weight tables (recurrence +
        # seed); emits only the convergent functionals (trend,
        # forecast) — the unit-eigenvalue identifiability note in
        # timeseries.holt_winters_forecast
        ("user_value_hw_forecast", A.user_value_hw_forecast,
         holt_winters_forecast_duck(
             "SELECT user_id, ts, event_id, value FROM events "
             "WHERE value IS NOT NULL",
             ["user_id"], "ts", "value", "event_id", A.HW_PERIOD),
         ("timeseries", "forecast", "seasonal", "window")),
        # round-12: classical additive decomposition — centered 2x4-MA
        # trend, zero-sum phase seasonal, remainder; 6-dp decimal
        # re-quantization keeps every sum order-independent
        # (timeseries.seasonal_decompose)
        ("user_value_decomposition", A.user_value_decomposition,
         seasonal_decompose_duck(
             "SELECT user_id, ts, event_id, value FROM events "
             "WHERE value IS NOT NULL",
             ["user_id"], "ts", "value", "event_id", A.HW_PERIOD),
         ("timeseries", "seasonal", "window")),
        # round-12: two-cohort log-rank test — observed-vs-expected
        # event counts over the shared risk-set timeline, 9-dp decimal
        # term sums, threshold verdict (hypothesis.logrank_test)
        ("signup_purchase_logrank", A.signup_purchase_logrank,
         logrank_test_duck(A._LOGRANK_SUBJECTS_SQL, "duration_us",
                           "event", "grp", "early", "late"),
         ("survival", "hypothesis", "experiment")),
        # round-12: chi-square test of independence — the whole-table
        # verdict over the segment×region contingency the PMI grid
        # scores cell by cell; full grid incl. unobserved cells, 9-dp
        # decimal term sums (hypothesis.chi2_independence)
        ("chi2_segment_region", A.chi2_segment_region,
         chi2_independence_duck(
             """SELECT c.c_mktsegment, r.r_name
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey""",
             "c_mktsegment", "r_name", A.CHI2_CRIT_DOF16),
         ("hypothesis", "stats", "association")),
        # round-12: Mann–Whitney U rank-sum — exact-integer 2U over
        # distinct values via the KS distributed prefix sum, DECIMAL
        # tie correction, threshold verdict (hypothesis.mann_whitney_u)
        ("mwu_order_price_regions", A.mwu_order_price_regions,
         mann_whitney_u_duck(
             f"SELECT o_totalprice FROM ({_ORDERS_REGION_SQL}) "
             "WHERE r_name = 'EUROPE'",
             f"SELECT o_totalprice FROM ({_ORDERS_REGION_SQL}) "
             "WHERE r_name = 'ASIA'",
             "o_totalprice"),
         ("hypothesis", "stats", "window")),
        # round-12: Spearman rank correlation — midranks via the KS
        # distributed prefix sum, exact half-integer decimal ranks,
        # Pearson over ranks (hypothesis.spearman_corr)
        # round-12: Kruskal-Wallis k-group rank test — midranks via
        # the distributed prefix sum, tie-corrected H, threshold
        # verdict (hypothesis.kruskal_wallis)
        # round-12: embedding-space drift — centroid cosine/L2 from
        # exact per-dimension decimal sums; the vector-space complement
        # of PSI/KS scalar drift (drift.embedding_drift)
        # round-12: rank-biased overlap — top-weighted list agreement
        # between the two exact lexical scorers; Python-literal RBO
        # weights, max-rank switch-on depths (evaluation.rbo_overlap)
        ("rbo_bm25_vs_lm", A.rbo_bm25_vs_lm,
         rbo_overlap_duck(
             "SELECT 1 AS query_id, doc_id, \"rank\" FROM ("
             + _oracle_bm25_15 + ")",
             "SELECT 1 AS query_id, doc_id, \"rank\" FROM ("
             + _lm_duck_15 + ")",
             A.RBO_DEPTH, rank_col='"rank"'),
         ("evaluation", "ranking", "stats")),
        ("embedding_drift_labels", A.embedding_drift_labels,
         embedding_drift_duck(
             "SELECT embedding FROM embeddings WHERE label < 5",
             "SELECT embedding FROM embeddings WHERE label >= 5"),
         ("drift", "similarity", "stats")),
        ("kw_order_price_regions", A.kw_order_price_regions,
         kruskal_wallis_duck(
             f"SELECT r_name, o_totalprice FROM ({_ORDERS_REGION_SQL})",
             "r_name", "o_totalprice", A.CHI2_CRIT_DOF4),
         ("hypothesis", "stats", "window")),
        # round-13: one-way ANOVA — the parametric k-group mean test
        # beside KW's rank test; exact decimal Σv/Σv², 9-dp quantized
        # between-group terms (hypothesis.anova_f)
        ("anova_order_price_regions", A.anova_order_price_regions,
         anova_f_duck(
             f"SELECT r_name, o_totalprice FROM ({_ORDERS_REGION_SQL})",
             "r_name", "o_totalprice", A.ANOVA_F_CRIT_DOF4),
         ("hypothesis", "stats", "agg")),
        # round-13: Welch's unequal-variance t — the parametric pair
        # test beside MWU; Welch–Satterthwaite dof (hypothesis.welch_t)
        ("welch_order_price_regions", A.welch_order_price_regions,
         welch_t_duck(
             f"SELECT o_totalprice FROM ({_ORDERS_REGION_SQL}) "
             "WHERE r_name = 'EUROPE'",
             f"SELECT o_totalprice FROM ({_ORDERS_REGION_SQL}) "
             "WHERE r_name = 'ASIA'",
             "o_totalprice", A.WELCH_T_CRIT),
         ("hypothesis", "stats", "agg")),
        # round-13: Nelson–Aalen cumulative hazard — the hazard-scale
        # companion of the KM curve on the same subjects; exact 9-dp
        # decimal hazard prefix sums (survival.nelson_aalen)
        ("signup_purchase_hazard", A.signup_purchase_hazard,
         nelson_aalen_duck(A._KM_SUBJECTS_SQL, "duration_us", "event",
                           ["cohort"]),
         ("survival", "window", "analytics")),
        # round-13: EWMA control chart — per-row smoothed value vs
        # widening 3σ limits; literal decimal weight/limit-factor
        # tables, bounded-lag pair join (anomaly.ewma_control)
        ("user_value_ewma_chart", A.user_value_ewma_chart,
         ewma_control_duck(
             "SELECT user_id, ts, event_id, value FROM events "
             "WHERE value IS NOT NULL",
             ["user_id"], "ts", "value", "event_id",
             lam=A.EWMA_LAM, n_sigma=A.EWMA_L),
         ("anomaly", "timeseries", "window")),
        # round-13: t-closeness — per-QI-group EMD to the global
        # sensitive distribution on the k-anon/l-div QI; full grid,
        # 9-dp quantized cells (privacy.t_closeness_audit)
        ("t_closeness_customers", A.t_closeness_customers,
         t_closeness_audit_duck(A._L_DIVERSITY_SQL,
                                ["c_mktsegment", "n_name"], "acct_band",
                                A.T_CLOSENESS_T, ordered=True),
         ("privacy", "agg", "audit")),
        # round-13: per-region Shannon entropy + Gini impurity of the
        # order-priority mix — 9-dp quantized n·ln n and share² terms
        # (profiling.column_entropy)
        ("entropy_order_priority_regions",
         A.entropy_order_priority_regions,
         column_entropy_duck(
             f"SELECT r_name, o_orderpriority FROM ({_ORDERS_REGION_SQL})",
             "o_orderpriority", ["r_name"]),
         ("profiling", "stats", "agg")),
        # round-13: CUPED variance-reduced A/B — pre-period covariate
        # adjustment before the arm comparison (hypothesis.cuped_ab_test)
        ("cuped_user_value_ab", A.cuped_user_value_ab,
         cuped_ab_test_duck(
             f"""SELECT user_id,
       SUM(CASE WHEN day(ts) < {A.CUPED_SPLIT_DAY} THEN value END)
         AS pre_value,
       SUM(CASE WHEN day(ts) >= {A.CUPED_SPLIT_DAY} THEN value END)
         AS post_value,
       CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
FROM events WHERE value IS NOT NULL GROUP BY user_id""",
             "arm", "post_value", "pre_value", "A", "B"),
         ("hypothesis", "experiment", "stats")),
        # round-14 wave 2: Page-Hinkley target-free mean-drift alarms
        # over the per-user value series (anomaly.page_hinkley_alarms)
        ("user_value_ph_drift", A.user_value_ph_drift,
         page_hinkley_alarms_duck(
             "SELECT event_id, ts, user_id, value FROM events",
             ["user_id"], "ts", "value", A.PH_DELTA, A.PH_LAMBDA,
             seq_col="event_id"),
         ("anomaly", "stats", "window")),
        # round-14 wave 2: per-region HHI of customer spend — the
        # concentration twin of the graded Gini
        # (profiling.hhi_concentration)
        ("hhi_customer_value_regions", A.hhi_customer_value_regions,
         hhi_concentration_duck(
             "SELECT r_name, o_custkey, CAST(o_totalprice AS "
             "DECIMAL(18,2)) AS o_totalprice FROM ("
             + _ORDERS_REGION_SQL + ")",
             "o_totalprice", ["o_custkey"], ["r_name"]),
         ("profiling", "stats")),
        # round-14 wave 2: Kendall tau-b on the quantity x linenumber
        # ordinal grid — full tie-corrected variance
        # (hypothesis.kendall_tau)
        ("kendall_quantity_linenumber", A.kendall_quantity_linenumber,
         kendall_tau_duck(
             "SELECT l_quantity, l_linenumber FROM lineitem",
             "l_quantity", "l_linenumber"),
         ("hypothesis", "stats")),
        # round-14 wave 2: G-test of independence — the likelihood-
        # ratio twin of the graded chi-square on the same contingency
        # (hypothesis.g_test_independence)
        ("gtest_segment_region", A.gtest_segment_region,
         g_test_independence_duck(
             "SELECT c_mktsegment, r_name FROM customer "
             "JOIN nation ON c_nationkey = n_nationkey "
             "JOIN region ON n_regionkey = r_regionkey",
             "c_mktsegment", "r_name", A.CHI2_CRIT_DOF16),
         ("hypothesis", "stats")),
        # round-14 wave 2: Dickey-Fuller ADF(0) stationarity per user
        # series — one lag window + exact-decimal OLS closed form
        # (timeseries.dickey_fuller)
        ("user_value_stationarity", A.user_value_stationarity,
         dickey_fuller_duck(
             "SELECT event_id, ts, user_id, value FROM events",
             ["user_id"], "ts", "value", seq_col="event_id"),
         ("timeseries", "stats", "window")),
        # round-14 wave 2: RFM segmentation — integer-exact
        # value-quantile scores over per-customer aggregates
        # (profiling.rfm_scores)
        ("rfm_customer_segments", A.rfm_customer_segments,
         rfm_scores_duck("SELECT o_custkey, o_orderdate, o_totalprice "
                         "FROM orders",
                         "o_custkey", "o_orderdate", "o_totalprice"),
         ("profiling", "curation", "window")),
        # round-14 wave 2: association effect sizes — Cramér's V/phi
        # from the chi-square pipeline, MI/NMI from the quantized-ln
        # grid (hypothesis.cramers_v, mutual_information)
        ("association_strength_segment_region",
         A.association_strength_segment_region,
         cramers_v_duck(
             "SELECT c_mktsegment, r_name FROM customer "
             "JOIN nation ON c_nationkey = n_nationkey "
             "JOIN region ON n_regionkey = r_regionkey",
             "c_mktsegment", "r_name", A.CHI2_CRIT_DOF16),
         ("hypothesis", "stats")),
        ("mi_segment_region", A.mi_segment_region,
         mutual_information_duck(
             "SELECT c_mktsegment, r_name FROM customer "
             "JOIN nation ON c_nationkey = n_nationkey "
             "JOIN region ON n_regionkey = r_regionkey",
             "c_mktsegment", "r_name"),
         ("hypothesis", "stats")),
        # round-14 wave 2: TextRank corpus keywords — weighted pagerank
        # over the window-2 co-occurrence word graph, oracle-unrolled
        # iterations (keywords.textrank_keywords)
        ("textrank_keywords_docs", A.textrank_keywords_docs,
         textrank_keywords_duck(k=20),
         ("keywords", "graph", "iterative", "text")),
        # round-15: Levene's equal-variance test, mean center — the
        # textbook original beside the graded Brown-Forsythe median
        # form (hypothesis.levene_test)
        ("levene_order_price_regions", A.levene_order_price_regions,
         levene_test_duck(
             f"SELECT r_name, o_totalprice FROM ({_ORDERS_REGION_SQL})",
             "r_name", "o_totalprice", A.ANOVA_F_CRIT_DOF4),
         ("hypothesis", "stats", "agg")),
        # round-15: Cohen's d + Hedges' g — standardized effect size
        # beside the Welch/MWU verdicts (hypothesis.cohens_d)
        ("cohens_d_order_price", A.cohens_d_order_price,
         cohens_d_duck(
             f"SELECT o_totalprice FROM ({_ORDERS_REGION_SQL}) "
             "WHERE r_name = 'EUROPE'",
             f"SELECT o_totalprice FROM ({_ORDERS_REGION_SQL}) "
             "WHERE r_name = 'ASIA'",
             "o_totalprice"),
         ("hypothesis", "stats")),
        # round-15: point-biserial correlation — binary flag x value in
        # one grouped aggregate (hypothesis.point_biserial)
        ("point_biserial_return_price", A.point_biserial_return_price,
         point_biserial_duck(
             "SELECT l_returnflag, l_extendedprice FROM lineitem",
             "l_returnflag = 'R'", "l_extendedprice"),
         ("hypothesis", "stats")),
        # round-15: Friedman rank test — repeated-measures ranks within
        # region blocks, doubled-midrank exact integers
        # (hypothesis.friedman_test)
        ("friedman_region_priority_price",
         A.friedman_region_priority_price,
         friedman_test_duck(
             f"SELECT r_name, o_orderpriority, o_totalprice "
             f"FROM ({_ORDERS_REGION_SQL})",
             "r_name", "o_orderpriority", "o_totalprice",
             A.CHI2_CRIT_DOF4),
         ("hypothesis", "stats", "window")),
        # round-15: Cochran's Q — binary repeated measures over nation
        # blocks, pure-integer sums (hypothesis.cochran_q)
        ("cochran_q_nation_priority", A.cochran_q_nation_priority,
         cochran_q_duck(
             "SELECT n_name, o_orderpriority, o_totalprice "
             "FROM orders JOIN customer ON o_custkey = c_custkey "
             "JOIN nation ON c_nationkey = n_nationkey",
             "n_name", "o_orderpriority",
             f"o_totalprice > {A.COCHRAN_BAR}", A.CHI2_CRIT_DOF4),
         ("hypothesis", "stats")),
        # round-15: ordinal-association battery — gamma, Somers' D both
        # directions, Stuart's tau-c from the Kendall pair counts
        # (hypothesis.ordinal_association)
        ("ordinal_assoc_quantity_linenumber",
         A.ordinal_assoc_quantity_linenumber,
         ordinal_association_duck(
             "SELECT l_quantity, l_linenumber FROM lineitem",
             "l_quantity", "l_linenumber"),
         ("hypothesis", "stats")),
        # round-15: Cohen's kappa — chance-corrected label agreement,
        # exact-integer grid (hypothesis.cohen_kappa)
        # round-15: McNemar's paired test — asymmetric-disagreement
        # complement of the kappa agreement on the same paired labels
        # (hypothesis.mcnemar_test)
        ("mcnemar_urgency_value", A.mcnemar_urgency_value,
         mcnemar_test_duck(
             "SELECT o_orderpriority, o_totalprice FROM orders",
             "o_orderpriority IN ('1-URGENT', '2-HIGH')",
             "o_totalprice > 150000.0", A.CHI2_CRIT_DOF1),
         ("hypothesis", "stats")),
        ("kappa_priority_value_bands", A.kappa_priority_value_bands,
         cohen_kappa_duck(
             "SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
             " THEN 'high' ELSE 'low' END AS urgency, "
             "CASE WHEN o_totalprice > 150000.0 THEN 'high' ELSE 'low' "
             "END AS value_band FROM orders",
             "urgency", "value_band"),
         ("hypothesis", "stats")),
        # round-15: Theil's uncertainty coefficient — asymmetric MI
        # normalization over the graded segment x region grid
        # (hypothesis.uncertainty_coefficient)
        ("uncertainty_segment_region", A.uncertainty_segment_region,
         uncertainty_coefficient_duck(
             "SELECT c_mktsegment, r_name FROM customer "
             "JOIN nation ON c_nationkey = n_nationkey "
             "JOIN region ON n_regionkey = r_regionkey",
             "c_mktsegment", "r_name"),
         ("hypothesis", "stats")),
        # round-15: Theil + Atkinson inequality — entropy-family
        # inequality beside the graded Gini, quantized mean + terms
        # (profiling.inequality_indexes)
        ("inequality_order_value_regions",
         A.inequality_order_value_regions,
         inequality_indexes_duck(
             f"SELECT r_name, CAST(o_totalprice AS DECIMAL(18,2)) "
             f"AS o_totalprice FROM ({_ORDERS_REGION_SQL})",
             "o_totalprice", ["r_name"]),
         ("profiling", "stats", "agg")),
        # round-15: bounded distribution distances — JSD / Hellinger /
        # TV over the PSI bin machinery, zero-safe
        # (drift.distribution_distance)
        ("price_distribution_distance", A.price_distribution_distance,
         distribution_distance_duck(
             f"SELECT o_totalprice FROM ({_ORDERS_REGION_SQL}) "
             "WHERE r_name = 'EUROPE'",
             f"SELECT o_totalprice FROM ({_ORDERS_REGION_SQL}) "
             "WHERE r_name = 'ASIA'",
             "o_totalprice"),
         ("drift", "stats")),
        # round-15: Wald-Wolfowitz runs test — randomness of the daily
        # order-value series around its median (timeseries.runs_test)
        ("runs_daily_order_value", A.runs_daily_order_value,
         runs_test_duck(
             "SELECT o_orderdate, CAST(SUM(CAST(o_totalprice AS "
             "DECIMAL(18,2))) AS DOUBLE) AS daily_value, "
             "'daily' AS series FROM orders GROUP BY o_orderdate",
             ["series"], "o_orderdate", "daily_value"),
         ("timeseries", "stats", "window")),
        # round-15: Zipf-law fit — log-log OLS of the corpus
        # rank-frequency curve over the top-1000 terms
        # (keywords.zipf_fit)
        ("zipf_term_frequencies", A.zipf_term_frequencies,
         zipf_fit_duck("text"),
         ("text", "stats")),
        # round-13: Jarque-Bera normality audit — two-pass 9-dp
        # quantized central moments, chi2(2) verdict
        # (hypothesis.jarque_bera)
        ("jb_order_price_regions", A.jb_order_price_regions,
         jarque_bera_duck(
             f"SELECT r_name, o_totalprice FROM ({_ORDERS_REGION_SQL})",
             "o_totalprice", ["r_name"]),
         ("hypothesis", "stats", "profiling")),
        # round-13: Brown-Forsythe equal-variance test — median-centered
        # Levene as ANOVA-on-|x - med_g| (hypothesis.brown_forsythe)
        ("bf_order_price_regions", A.bf_order_price_regions,
         brown_forsythe_duck(
             f"SELECT r_name, o_totalprice FROM ({_ORDERS_REGION_SQL})",
             "r_name", "o_totalprice", A.ANOVA_F_CRIT_DOF4),
         ("hypothesis", "stats", "agg")),
        # round-13: Mann-Kendall trend + Theil-Sen slope — robust
        # monotone-trend verdict + median pairwise slope per nation's
        # monthly series (regression.mann_kendall_trend)
        ("mk_nation_monthly_trend", A.mk_nation_monthly_trend,
         mann_kendall_trend_duck(
             "SELECT n_name, CAST(year(o_orderdate) * 12 "
             "+ month(o_orderdate) AS BIGINT) AS month_idx, "
             "SUM(o_totalprice) AS monthly_value "
             f"FROM ({_ORDERS_REGION_SQL}) GROUP BY 1, 2",
             ["n_name"], "month_idx", "monthly_value"),
         ("hypothesis", "regression", "stats")),
        # round-13: HITS hubs & authorities over the DIRECTED
        # customer→supplier purchase graph — the oracle unrolls all
        # HITS_DEMO_ITERS (4) half-step pairs with their L1
        # normalizations (graph.hits)
        ("part_hits_copurchase", A.part_hits_copurchase,
         hits_duck(
             "SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src, "
             "'s' || CAST(l_suppkey AS VARCHAR) AS dst "
             "FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
             iters=A.HITS_DEMO_ITERS),
         ("graph", "iterative", "join")),
        ("spearman_quantity_price", A.spearman_quantity_price,
         spearman_corr_duck(
             "SELECT l_quantity, l_extendedprice FROM lineitem",
             "l_quantity", "l_extendedprice"),
         ("hypothesis", "stats", "window")),
        # round-12: per-region Gini concentration — the sorted-rank
        # Lorenz identity from exact decimal sums; the DOUBLE fixture
        # price is cast to DECIMAL(18,2) in BOTH engines so `total` is
        # an order-independent exact sum (profiling.gini_concentration)
        ("gini_order_value_regions", A.gini_order_value_regions,
         gini_concentration_duck(
             "SELECT r_name, CAST(o_totalprice AS DECIMAL(18,2)) "
             "AS o_totalprice FROM (" + _ORDERS_REGION_SQL + ")",
             "o_totalprice", ["r_name"]),
         ("profiling", "stats", "window")),
        # round-12: per-user autocorrelation (lags 1..3) — one
        # lead-window pass + exact DECIMAL(20,6) product sums, the
        # corr_matrix discipline per lag (timeseries.autocorrelation)
        ("user_value_acf", A.user_value_acf,
         autocorrelation_duck(
             "SELECT user_id, ts, event_id, value FROM events",
             ["user_id"], "ts", "value", A.ACF_MAX_LAG, "event_id"),
         ("timeseries", "stats", "window")),
        # round-12: Benford first-digit audit — string digit extraction
        # from the DECIMAL column, Python-literal Benford shares, GOF
        # verdict at dof 8 (profiling.benford_audit)
        ("benford_order_prices", A.benford_order_prices,
         benford_audit_duck(
             "SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS _price_dec "
             "FROM orders",
             "_price_dec", A.CHI2_CRIT_DOF8),
         ("profiling", "quality", "hypothesis")),
        # round-12: U-shaped (40-20-40) position-based attribution —
        # first/last touch events carry 40% each, middles split 20%;
        # per-term DECIMAL quantization on the funnel exchange
        # (sequences.ushaped_attribution)
        ("purchase_attribution_ushaped", A.purchase_attribution_ushaped,
         ushaped_attribution_duck(A.ATTR_TOUCHES, A.ATTR_CONVERSION),
         ("sequence", "attribution", "window")),
        # round-12: first-touch — the acquisition-credit twin of the
        # graded last-touch query (sequences.first_touch_attribution)
        ("purchase_attribution_first", A.purchase_attribution_first,
         first_touch_attribution_duck(A.ATTR_TOUCHES, A.ATTR_CONVERSION),
         ("sequence", "attribution", "window")),
        # round-12: time-decay attribution — recency-weighted credit
        # 2^(−gap/half_life) within an attribution window riding the
        # join condition (sequences.time_decay_attribution)
        # round-12: frequent event paths — consecutive event-type
        # n-grams, the exploratory complement of the funnel family
        # (sequences.frequent_paths)
        ("frequent_event_paths", A.frequent_event_paths,
         frequent_paths_duck(A.PATHS_LEN, top_n=A.PATHS_TOP_N),
         ("sequence", "window", "topk")),
        ("purchase_attribution_decay", A.purchase_attribution_decay,
         time_decay_attribution_duck(
             A.ATTR_TOUCHES, A.ATTR_CONVERSION,
             A.DECAY_ATTR_HALF_LIFE_S, A.DECAY_ATTR_WINDOW_S),
         ("sequence", "attribution", "decay")),
        # round-11: Kaplan–Meier survival — time-to-event with right
        # censoring; exact integer counts per factor, running product
        # as EXP(Σ ln) + a zero-factor flag (operators/survival.py)
        ("signup_purchase_survival", A.signup_purchase_survival,
         km_survival_duck(A._KM_SUBJECTS_SQL, "duration_us", "event",
                          ["cohort"]),
         ("survival", "window", "analytics")),
        # round-11: FlinkCEP `until` on a looping step — the quantifier
        # expansion composed with per-internal-gap absence layers
        # (sequences.until_funnel_times); one exchange, oracle replays
        # the same desugaring
        ("until_funnel_users", A.until_funnel_users,
         until_funnel_times_duck(A.UNTIL_STEPS, A.UNTIL_STOPS),
         ("cep", "window", "negation", "quantifier")),
        # round-11: strict-contiguity CEP (FlinkCEP next/notNext) —
        # per-anchor lead-adjacency block matches chained by the
        # relaxed running-min layers; earliest anchor is NOT always
        # extendable under strict gaps, so every anchor is tried
        # (operators/sequences.py strict_funnel_times)
        ("strict_funnel_users", A.strict_funnel_users,
         strict_funnel_times_duck(A.STRICT_FUNNEL_STEPS,
                                  A.STRICT_FUNNEL_CONTIG,
                                  A.STRICT_FUNNEL_NOT_NEXT),
         ("cep", "window", "strict", "sequence")),
        # round-12: FlinkCEP times(n).consecutive() — strict contiguity
        # inside a looping step, the quantifier expansion composed with
        # the strict engine's per-anchor block matching
        # (sequences.consecutive_funnel_times)
        ("consecutive_funnel_users", A.consecutive_funnel_users,
         consecutive_funnel_times_duck(A.CONSEC_STEPS, A.CONSEC_LOOPS),
         ("sequence", "cep", "strict", "quantifier")),
        # round-12: all-matches CEP emission (FlinkCEP's default
        # AfterMatchSkipStrategy.noSkip()) — one row per completing
        # step-1 anchor EVENT, greedy earliest continuation via
        # backward struct-chain window layers; the oracle replays the
        # same layers (sequences.all_funnel_matches)
        ("all_funnel_matches_users", A.all_funnel_matches_users,
         all_funnel_matches_duck(A.ALL_MATCHES_STEPS),
         ("sequence", "cep", "window", "all-matches")),
        # round-12: skipPastLastEvent — greedy leftmost non-overlapping
        # matches, matched events consumed; bounded selection rounds
        # unrolled by the oracle (sequences.consumed_funnel_matches)
        ("consumed_funnel_matches_users", A.consumed_funnel_matches_users,
         consumed_funnel_matches_duck(A.ALL_MATCHES_STEPS,
                                      A.CONSUMED_MAX_MATCHES),
         ("sequence", "cep", "iterative", "all-matches")),
        # round-13: skipToFirst(p) / skipToLast(p) — re-anchored greedy
        # rounds over the all-matches core on the quantifier expansion;
        # the quantified click step is where first vs last differ
        # (sequences.skip_to_funnel_matches)
        ("skip_to_first_funnel_users", A.skip_to_first_funnel_users,
         skip_to_funnel_matches_duck(A.SKIP_TO_STEPS, A.SKIP_TO_STEP,
                                     A.SKIP_TO_MAX_MATCHES, "first"),
         ("sequence", "cep", "iterative", "all-matches")),
        ("skip_to_last_funnel_users", A.skip_to_last_funnel_users,
         skip_to_funnel_matches_duck(A.SKIP_TO_STEPS, A.SKIP_TO_STEP,
                                     A.SKIP_TO_MAX_MATCHES, "last"),
         ("sequence", "cep", "iterative", "all-matches")),
        # round-14: optional() pattern steps — include/exclude variant
        # layers over the single funnel exchange, earliest-final /
        # most-inclusive pick (sequences.optional_funnel_times)
        ("optional_funnel_users", A.optional_funnel_users,
         optional_funnel_times_duck(A.OPTIONAL_STEPS, A.OPTIONAL_IDX),
         ("sequence", "cep", "window")),
        # round-14: pattern groups — Pattern.begin(Pattern) with
        # times(2) AND optional() on the same subsequence, desugared to
        # unit-toggled variant layers (sequences.group_funnel_times)
        ("group_funnel_users", A.group_funnel_users,
         group_funnel_times_duck(
             ["signup", Group(["view", "click"], times=2, optional=True),
              "purchase"]),
         ("sequence", "cep", "window")),
        # round-15: greedy() loop modifier — the LAST Pattern.java loop
        # construct: reluctant completion instants with maximal-run loop
        # attribution (t_g = last absorbed rep + an absorbed count),
        # bounded by the first suffix instant
        # (sequences.greedy_funnel_times)
        ("greedy_funnel_users", A.greedy_funnel_users,
         greedy_funnel_times_duck(A.GREEDY_STEPS, A.GREEDY_IDX),
         ("sequence", "cep", "window")),
        # round-15: bounded followedByAny — per-anchor lex-top-N
        # combination matches, viable-prefix bound per stage
        # (sequences.any_funnel_matches)
        ("any_funnel_matches_users", A.any_funnel_matches_users,
         any_funnel_matches_duck(["view", "click", "purchase"],
                                 A.ANY_MATCHES_PER_ANCHOR),
         ("sequence", "cep", "all-matches")),
        # round-10: linear multi-touch attribution — per-conversion
        # credit split across distinct prior touch types, term-level
        # DECIMAL quantization (sequences.linear_attribution)
        ("purchase_attribution_linear", A.purchase_attribution_linear,
         linear_attribution_duck(A.ATTR_TOUCHES, A.ATTR_CONVERSION),
         ("sequence", "attribution", "window")),
        # round-10: conversion-speed stats — type-1 rank-picked gap
        # percentiles per funnel transition (no interpolation — the
        # engine-portable percentile; sequences.funnel_conversion_stats)
        ("funnel_time_to_convert", A.funnel_time_to_convert,
         funnel_conversion_stats_duck(A.FUNNEL_STEPS),
         ("sequence", "cep", "window", "stats")),
        # round-9: last-touch revenue attribution — one funnel-family
        # exchange carrying last(touch, ignorenulls), DECIMAL sums
        ("purchase_attribution", A.purchase_attribution,
         last_touch_attribution_duck(A.ATTR_TOUCHES, A.ATTR_CONVERSION),
         ("sequence", "attribution", "window")),
        ("cusum_user_value_shifts", A.cusum_user_value_shifts,
         cusum_first_alarms_duck(
             "SELECT event_id, ts, user_id, value FROM events",
             ["user_id"], "ts", "value", A.CUSUM_TARGET, A.CUSUM_SLACK,
             A.CUSUM_H, seq_col="event_id"),
         ("timeseries", "anomaly", "window")),
        # round-8e wave 2: k-anonymity audit over quasi-identifiers
        # (operators/privacy.py)
        ("k_anonymity_customers", A.k_anonymity_customers,
         k_anonymity_audit_duck(
             """SELECT c.c_mktsegment, n.n_name
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey""",
             ["c_mktsegment", "n_name"], A.K_ANON_K),
         ("privacy", "agg", "audit")),
        # round-8e wave 2: per-document TF-IDF keyword extraction
        # (operators/keywords.py — encoding-family tokenizer)
        ("keywords_tfidf_docs", A.keywords_tfidf_docs,
         tfidf_keywords_duck("SELECT doc_id, text FROM documents",
                             "text", "doc_id", top_n=5, min_df=2),
         ("text", "keywords", "ranking")),
        # rows-only by nature (approximate / provider-UDF surfaces)
        # round-8: mini-batch codebook update — matmul-argmin float ties
        # make exact SQL replay inappropriate, like the ANN tiers
        ("kmeans_minibatch_cells", llm.kmeans_minibatch_cells, None,
         ("similarity", "clustering", "incremental")),
        # round-8: greedy MMR — sequential argmax over an evolving
        # selected set; numpy path, greedy contract pinned by pytest
        ("mmr_reranked_retrieval", llm.mmr_reranked_retrieval, None,
         ("similarity", "ranking", "diversity")),
        ("cms_user_counts", llm.cms_user_counts, None,
         ("agg", "sketch", "frequency")),
        ("ann_lsh_vec7", llm.ann_lsh_vec7, None, ("similarity", "ann")),
        ("ann_ivf_vec7", llm.ann_ivf_vec7, None, ("similarity", "ann")),
        ("embed_documents_sample", llm.embed_documents_sample,
         None, ("rag", "udf")),
    ]
