"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay pipeline; ``queries()`` exposes
one callable per implemented operator (SURVEY.md §2); ``oracle_sql()``
carries the DuckDB-equivalent SQL with IDENTICAL column names. Ray is
initialised by the driver before this module is imported — nothing here
calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable
from datetime import timedelta
from typing import Any

# fixed-size synthetic change-event tables (deterministic, cached in /tmp)
CDC_N_SMALL = 6_000  # entry() smoke scale
CDC_N_QUERY = 20_000  # queries()/oracle correctness scale

_CDC_EVENTS_QUERY_DIR = f"/tmp/graft_change_events/n{CDC_N_QUERY}_s42"


def _run_replay(n_events: int, num_buckets: int = 16):
    from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake
    from embulk_input_marketo_ray.synth import (
        BASE_TS,
        default_events_dir,
        generate_change_events,
        load_evolution_log,
    )

    events_dir = default_events_dir(n_events)
    generate_change_events(events_dir, n_events)
    lake_dir = tempfile.mkdtemp(prefix="graft_lake_")
    cfg = ReplayConfig(
        events_dir=events_dir,
        lake_dir=lake_dir,
        evolution_log=load_evolution_log(events_dir),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=n_events + 50),
        fetch_days=100,
        num_buckets=num_buckets,
    )
    replay(cfg)
    return read_lake(lake_dir)


def entry() -> Any:
    """Flagship pipeline: CDC replay -> exactly-once upserted lake."""
    return _run_replay(CDC_N_SMALL)


def _q_cdc_replay(sf_dir: str):
    """Flagship as a correctness query (fixed scale, independent of sf:
    the input is the engine's own change-event table, not a testdata
    table; the oracle reads the same parquet path)."""
    lake = _run_replay(CDC_N_QUERY)
    return lake.select_columns(["repo", "path", "commit_seq", "content_sha256"])


def queries() -> dict[str, Callable[[str], Any]]:
    from embulk_input_marketo_ray.pipelines import queries as qmod

    class q:
        """Each query is wrapped so the shuffle strategy is set BEFORE
        the query creates its Dataset (the plan snapshots DataContext
        at dataset-creation time)."""

    for _name in dir(qmod):
        if _name.startswith("q_"):
            def _wrap(fn=getattr(qmod, _name)):
                def run(sf_dir: str):
                    qmod._ensure_hash_shuffle()
                    return fn(sf_dir)

                return run

            setattr(q, _name, staticmethod(_wrap()))

    # Key order is deliberate: the correctness driver samples the FIRST 50
    # dict keys, so the flagship stays in slot 1 and the entries that have
    # not yet carried a driver correctness row come next, cheapest-first
    # (by the last bench's per-query wall time) to maximise rows per driver
    # time budget; previously-sampled entries follow.
    return {
        "cdc_replay": _q_cdc_replay,
        "program_date_range": q.q_program_date_range,
        "custom_object_filter_values": q.q_custom_object_filter_values,
        "path_lifecycle": q.q_path_lifecycle,
        "version_retention": q.q_version_retention,
        "scd2_history": q.q_scd2_history,
        "repo_freshness": q.q_repo_freshness,
        "cdc_before_image": q.q_cdc_before_image,
        "event_rolling_stats": q.q_event_rolling_stats,
        "cdc_late_arrivals": q.q_cdc_late_arrivals,
        "repo_churn_concentration": q.q_repo_churn_concentration,
        "user_interarrival": q.q_user_interarrival,
        "user_retention": q.q_user_retention,
        "event_transitions": q.q_event_transitions,
        "event_trigram_paths": q.q_event_trigram_paths,
        "doc_bottomk_sample": q.q_doc_bottomk_sample,
        "embedding_power_iteration": q.q_embedding_power_iteration,
        "repo_activity_trend": q.q_repo_activity_trend,
        "embedding_truncation_error": q.q_embedding_truncation_error,
        "incremental_view": q.q_incremental_view,
        "embedding_quantize": q.q_embedding_quantize,
        "doc_weighted_sample": q.q_doc_weighted_sample,
        "token_kmv_distinct": q.q_token_kmv_distinct,
        "doc_chunks": q.q_doc_chunks,
        "token_overlap_sketch": q.q_token_overlap_sketch,
        "bpe_pair_stats": q.q_bpe_pair_stats,
        "doc_span_corruption": q.q_doc_span_corruption,
        "lineitem_discount_revenue": q.q_lineitem_discount_revenue,
        "funnel_latency": q.q_funnel_latency,
        "doc_compression_ratio": q.q_doc_compression_ratio,
        "value_quantile_sketch": q.q_value_quantile_sketch,
        "event_type_affinity": q.q_event_type_affinity,
        "token_packing": q.q_token_packing,
        "lang_token_quantiles": q.q_lang_token_quantiles,
        "order_volume_cumulative": q.q_order_volume_cumulative,
        "lang_confusion": q.q_lang_confusion,
        "vocab_coverage": q.q_vocab_coverage,
        "top_supplier_revenue": q.q_top_supplier_revenue,
        "doc_chunk_dedup": q.q_doc_chunk_dedup,
        "token_quantiles": q.q_token_quantiles,
        "event_trending": q.q_event_trending,
        "event_dedup_window": q.q_event_dedup_window,
        "cohort_revenue": q.q_cohort_revenue,
        "doc_length_ntiles": q.q_doc_length_ntiles,
        "lineitem_rollup_levels": q.q_lineitem_rollup_levels,
        "event_asof_join": q.q_event_asof_join,
        "event_range_join": q.q_event_range_join,
        "user_cm_sketch": q.q_user_cm_sketch,
        "event_funnel": q.q_event_funnel,
        "event_hop_windows": q.q_event_hop_windows,
        "part_revenue_by_nation": q.q_part_revenue_by_nation,
        "order_laggard_suppliers": q.q_order_laggard_suppliers,
        "doc_containment_pairs": q.q_doc_containment_pairs,
        "multimodal_thumbnails": q.q_multimodal_thumbnails,
        "event_rolling_median": q.q_event_rolling_median,
        "doc_global_rank": q.q_doc_global_rank,
        "doc_split_leakage_safe": q.q_doc_split_leakage_safe,
        "event_anomaly_days": q.q_event_anomaly_days,
        "source_lang_drift": q.q_source_lang_drift,
        "customer_pareto": q.q_customer_pareto,
        "doc_max_overlap": q.q_doc_max_overlap,
        "vocab_gini": q.q_vocab_gini,
        "minhash_precision_report": q.q_minhash_precision_report,
        "token_coverage_curve": q.q_token_coverage_curve,
        "repo_tree_depth": q.q_repo_tree_depth,
        "event_seasonality": q.q_event_seasonality,
        "cdc_op_mix": q.q_cdc_op_mix,
        "ship_lag_profile": q.q_ship_lag_profile,
        "cochange_kcore": q.q_cochange_kcore,
        "cochange_walk_rank": q.q_cochange_walk_rank,
        "embedding_outliers": q.q_embedding_outliers,
        "doc_novelty": q.q_doc_novelty,
        "doc_decontaminate": q.q_doc_decontaminate,
        "embedding_kmeans": q.q_embedding_kmeans,
        "part_promo_share": q.q_part_promo_share,
        "customer_rfm": q.q_customer_rfm,
        "customer_order_dist": q.q_customer_order_dist,
        "doc_curation_priority": q.q_doc_curation_priority,
        "customer_anti_join": q.q_customer_anti_join,
        "approx_distinct_users": q.q_approx_distinct_users,
        "doc_heavy_hitters": q.q_doc_heavy_hitters,
        "doc_keyterms": q.q_doc_keyterms,
        "part_small_qty": q.q_part_small_qty,
        "doc_token_rarity": q.q_doc_token_rarity,
        "multimodal_real_decode": q.q_multimodal_real_decode,
        "embedding_kmeans_refine": q.q_embedding_kmeans_refine,
        "part_min_price_supplier": q.q_part_min_price_supplier,
        "disjunctive_part_revenue": q.q_disjunctive_part_revenue,
        "shipping_priority": q.q_shipping_priority,
        "doc_surprisal": q.q_doc_surprisal,
        "order_exists_join": q.q_order_exists_join,
        "hop_distinct_users_hll": q.q_hop_distinct_users_hll,
        "doc_dup_windows": q.q_doc_dup_windows,
        "idle_customer_balance": q.q_idle_customer_balance,
        "doc_dup_coverage": q.q_doc_dup_coverage,
        "large_orders": q.q_large_orders,
        "order_priority_report": q.q_order_priority_report,
        "supplier_part_counts": q.q_supplier_part_counts,
        "doc_decontaminate_bloom": q.q_doc_decontaminate_bloom,
        "nation_pair_volume": q.q_nation_pair_volume,
        "ann_incremental_topk_deletes": q.q_ann_incremental_topk_deletes,
        "cochange_triangles": q.q_cochange_triangles,
        "returned_revenue_topk": q.q_returned_revenue_topk,
        "ann_incremental_topk": q.q_ann_incremental_topk,
        "nation_market_share": q.q_nation_market_share,
        "doc_dedup_near_keep_best": q.q_doc_dedup_near_keep_best,
        "bigram_collocations": q.q_bigram_collocations,
        "local_supplier_volume": q.q_local_supplier_volume,
        "dq_audit": q.q_dq_audit,
        "doc_cross_probe": q.q_doc_cross_probe,
        "doc_incremental_dedup_deletes": q.q_doc_incremental_dedup_deletes,
        "doc_incremental_dedup": q.q_doc_incremental_dedup,
        "time_travel": q.q_time_travel,
        "cdc_feed": q.q_cdc_feed,
        "snapshot_diff": q.q_snapshot_diff,
        "repo_head_stats": q.q_repo_head_stats,
        "repo_churn_topk": q.q_repo_churn_topk,
        "cdc_parent_seq": q.q_cdc_parent_seq,
        "doc_sample_stratified": q.q_doc_sample_stratified,
        "doc_mix_sample": q.q_doc_mix_sample,
        "doc_global_shuffle": q.q_doc_global_shuffle,
        "doc_curation_quantile": q.q_doc_curation_quantile,
        "doc_source_report": q.q_doc_source_report,
        "lineitem_rollup": q.q_lineitem_rollup,
        "customer_nation_report": q.q_customer_nation_report,
        "doc_boilerplate": q.q_doc_boilerplate,
        "doc_length_batches": q.q_doc_length_batches,
        "evolved_attrs": q.q_evolved_attrs,
        "key_lookup": q.q_key_lookup,
        "commit_windows": q.q_commit_windows,
        "co_change_pairs": q.q_co_change_pairs,
        "doc_jaccard_pairs": q.q_doc_jaccard_pairs,
        "watermark_slice": q.q_watermark_slice,
        "lww_latest": q.q_lww_latest,
        "dedup_first": q.q_dedup_first,
        "incremental_counts": q.q_incremental_counts,
        "enrich_join": q.q_enrich_join,
        "semi_join": q.q_semi_join,
        "included_fields": q.q_included_fields,
        "preview_limit": q.q_preview_limit,
        "distinct_values": q.q_distinct_values,
        "union_slices": q.q_union_slices,
        "session_windows": q.q_session_windows,
        "json_extract": q.q_json_extract,
        "doc_dedup_exact": q.q_doc_dedup_exact,
        "doc_tokens": q.q_doc_tokens,
        "doc_quality": q.q_doc_quality,
        "ann_topk": q.q_ann_topk,
        "doc_langid": q.q_doc_langid,
        "doc_fingerprint": q.q_doc_fingerprint,
        "doc_simhash": q.q_doc_simhash,
        "doc_minhash_dup_pairs": q.q_doc_minhash_dup_pairs,
        "doc_dup_clusters": q.q_doc_dup_clusters,
        "doc_simhash_dup_pairs": q.q_doc_simhash_dup_pairs,
        "doc_repetition": q.q_doc_repetition,
        "doc_pii_scan": q.q_doc_pii_scan,
        "doc_pii_redact": q.q_doc_pii_redact,
        "token_paged_source": q.q_token_paged_source,
        "offset_paged_source": q.q_offset_paged_source,
        "program_by_tag": q.q_program_by_tag,
        "offset_paged_csv": q.q_offset_paged_csv,
        "custom_object_source": q.q_custom_object_source,
        "lead_by_list_join": q.q_lead_by_list_join,
        "csv_parse": q.q_csv_parse,
        "ann_lsh_topk": q.q_ann_lsh_topk,
        "ann_ivf_topk": q.q_ann_ivf_topk,
        "embedding_near_dup": q.q_embedding_near_dup,
        "embedding_dup_clusters": q.q_embedding_dup_clusters,
        "multimodal_pipeline": q.q_multimodal_pipeline,
        "activity_static_schema": q.q_activity_static_schema,
        "doc_split": q.q_doc_split,
        "doc_curation": q.q_doc_curation,
        "doc_vocab_topk": q.q_doc_vocab_topk,
        "doc_dedup_near": q.q_doc_dedup_near,
        "doc_topk_per_lang": q.q_doc_topk_per_lang,
    }


ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale


def _fixture_record_sql(n: int, id_expr: str = "i", local_expr: str = "i") -> str:
    """SQL reproduction of FixtureServer._record for ``range(n)``:
    id / 'Campaign_%05d' / batch|trigger / ws<i%7>."""
    return f"""
        SELECT CAST({id_expr} AS BIGINT) AS id,
               printf('Campaign_%05d', {local_expr}) AS name,
               CASE WHEN ({local_expr}) % 3 = 0 THEN 'trigger' ELSE 'batch' END AS type,
               'ws' || CAST(({local_expr}) % 7 AS VARCHAR) AS workspaceName
        FROM range({n}) t(i)
    """


def _langid_sql() -> str:
    """Marker-count language id: per-lang non-overlapping regex counts,
    argmax with first-in-sorted-order tie-break, unknown when all 0 —
    the exact decision rule of stages/text.LangId."""
    from embulk_input_marketo_ray.stages.text import _LANG_MARKERS

    langs = sorted(_LANG_MARKERS)  # de, en, es, fr
    counts = ",\n".join(
        f"len(regexp_extract_all(lower(text), '{'|'.join(_LANG_MARKERS[lang])}')) AS c_{lang}"
        for lang in langs
    )
    best = " WHEN ".join(
        f"{' AND '.join(f'c_{lang} >= c_{other}' for other in langs if other != lang)} "
        f"THEN '{lang}'"
        for lang in langs[:-1]
    )
    return f"""
        WITH c AS (SELECT doc_id, lang, {counts} FROM documents)
        SELECT doc_id, lang,
               CASE WHEN greatest({', '.join('c_' + lang for lang in langs)}) = 0
                    THEN 'unknown'
                    WHEN {best}
                    ELSE '{langs[-1]}' END AS lang_pred
        FROM c
    """


def _doc_split_sql() -> str:
    """The exact multiplicative-hash split rule of q_doc_split: the
    HUGEINT cast keeps the 2^32-by-2^32 product exact (it overflows
    BIGINT); the cut constants are imported from the query module so
    both sides share one definition."""
    from embulk_input_marketo_ray.pipelines.queries import (
        SPLIT_HASH_MOD,
        SPLIT_HASH_MULT,
        SPLIT_TRAIN_CUT,
        SPLIT_VAL_CUT,
    )

    return f"""
        SELECT doc_id,
               CASE WHEN h < {SPLIT_TRAIN_CUT} THEN 'train'
                    WHEN h < {SPLIT_VAL_CUT} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 (CAST(doc_id % {SPLIT_HASH_MOD} AS HUGEINT) * {SPLIT_HASH_MULT})
                   % {SPLIT_HASH_MOD} AS h
          FROM documents
        )
    """


def _doc_curation_sql() -> str:
    """Language gate + quality thresholds, composed from the already
    oracle-validated langid decision rule and counter expressions."""
    from embulk_input_marketo_ray.pipelines.queries import (
        CURATION_MIN_WORDS,
        CURATION_PUNCT_DENOM,
    )

    return rf"""
        WITH lang AS ({_langid_sql()}),
        q AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len(regexp_extract_all(text, '\S+')) AS n_words,
                 len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
          FROM documents
        )
        SELECT lang.doc_id, lang.lang_pred, q.n_words
        FROM lang JOIN q ON lang.doc_id = q.doc_id
        WHERE lang.lang_pred = 'en'
          AND q.n_words >= {CURATION_MIN_WORDS}
          AND q.n_punct * {CURATION_PUNCT_DENOM} <= q.n_chars
    """


def oracle_sql() -> dict[str, str]:
    from embulk_input_marketo_ray.pipelines import oracles
    from embulk_input_marketo_ray.pipelines.queries import (
        ANN_NUM_QUERIES,
        CHURN_TOP_K,
        CONTAIN_DEN,
        CONTAIN_NUM,
        LAGGARD_TOP_K,
        OVERLAP_PACK,
        PARETO_TARGET_PM,
        Q9_PART_SUBSTR,
        ANOMALY_T_DEN,
        ANOMALY_T_NUM,
        ROLLMED_WINDOW,
        SPLIT_HASH_MOD,
        SPLIT_HASH_MULT,
        SPLIT_TRAIN_CUT,
        SPLIT_VAL_CUT,
        CO_CHANGE_MIN_WINDOWS,
        COMMIT_WINDOW_SECONDS,
        LOOKUP_KEYS,
        SAMPLE_DEFAULT_PER_MILLE,
        SAMPLE_RATES_PER_MILLE,
        MIX_WEIGHTS_PER_MILLE,
        HH_K,
        SHUFFLE_N_SHARDS,
        CURATION_QUANTILE_P,
        BOILERPLATE_MIN_DF,
        LENBATCH_BUCKET_TOKENS,
        LENBATCH_DOCS_PER_BATCH,
        SHUFFLE_HASH_MULT,
        MIX_BUDGET_PER_MILLE,
        SPLIT_HASH_MOD,
        SPLIT_HASH_MULT,
        ANN_TOP_K,
        CUSTOM_OBJECT_FROM,
        CUSTOM_OBJECT_TO,
        GROUP_TOP_K,
        SLICE_FROM,
        SLICE_TO,
        VOCAB_TOP_K,
        DECONTAM_BENCH_MOD,
        TOKEN_QUANTILE_PS,
        KEYTERMS_TOP_K,
        HOP_SECONDS,
        HOP_WINDOW_SECONDS,
        WALK_RANK_INIT,
        SPAN_MASK_PER_MILLE,
        MATRYOSHKA_K,
        BOTTOMK_K,
        COLLOC_MIN_PAIR,
        COLLOC_LIFT,
        RANGE_JOIN_SECONDS,
        DUPWIN_W,
        DUPWIN_MIN_DOCS,
        PACK_SEQ_LEN,
        FUNNEL_STAGES,
        CHUNK_TOKENS,
        CHUNK_OVERLAP,
        CHUNK_STRIDE,
        HIGH_PRIORITIES,
        ROLLING_WINDOW_ROWS,
        ANTI_JOIN_PRICE,
        EXISTS_LATE_DAYS,
        VOCAB_COVERAGE_PM,
        Q10_TOP_K,
        Q6_DISC_LO,
        Q6_DISC_HI,
        Q6_MAX_QTY,
        TREND_WINDOW_US,
        WEIGHTED_RATE_NUM,
        RETENTION_KEEP_N,
        ROLLUP_ALL,
        Q3_SEGMENT,
        Q3_TOP_K,
        Q5_REGION,
        Q5_FROM,
        Q5_TO,
        Q18_MIN_QTY,
        KMEANS_K,
        KMEANS_SCALE,
        BPE_TOP_K,
        NTILE_K,
    )

    # independently recomputed parquet oracles for the non-SQL kernels
    oracle_paths = oracles.materialize(ORACLE_SF_DIR)
    co_n = CUSTOM_OBJECT_TO - CUSTOM_OBJECT_FROM + 1

    from embulk_input_marketo_ray.stages.text import PII_EMAIL, PII_IPV4, PII_URL

    cdc_to = f"TIMESTAMP '2024-01-01' + INTERVAL {CDC_N_QUERY + 50} SECONDS"
    cdc_w1_to = f"TIMESTAMP '2024-01-01' + INTERVAL {CDC_N_QUERY // 2} SECONDS"
    _lookup_key_rows = ", ".join(
        f"('{repo}', '{path}')" for repo, path in LOOKUP_KEYS
    )
    _sample_rate_cases = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in sorted(SAMPLE_RATES_PER_MILLE.items())
    )
    _mix_weight_cases = " ".join(
        f"WHEN '{lang}' THEN {w}" for lang, w in sorted(MIX_WEIGHTS_PER_MILLE.items())
    )
    return {
        # --- sources (exact synthetic row sets, pure SQL) ---
        "token_paged_source": _fixture_record_sql(2000),
        "offset_paged_source": _fixture_record_sql(3000),
        "program_by_tag": f"SELECT * FROM ({_fixture_record_sql(3000)}) WHERE type = 'trigger'",
        "offset_paged_csv": _fixture_record_sql(1500),
        "custom_object_source": _fixture_record_sql(
            co_n, id_expr=f"i + {CUSTOM_OBJECT_FROM}", local_expr="i % 300"
        ),
        # filter-values mode: present values keep their in-chunk local
        # index (chunk0 = first 300 values 500..201, chunk1 = 200..151;
        # the two out-of-universe ids 900/901 are dropped AFTER the
        # universe check, so earlier locals are unchanged)
        "custom_object_filter_values": f"""
            {_fixture_record_sql(300, id_expr="500 - i")}
            UNION ALL
            {_fixture_record_sql(50, id_expr="200 - i")}
        """,
        "program_date_range": f"""
            SELECT * FROM ({_fixture_record_sql(3000)})
            WHERE id % 30 BETWEEN 2 AND 6
              AND workspaceName IN ('ws1', 'ws3')
        """,
        "lead_by_list_join": f"""
            SELECT r.id, r.name, r.type, r.workspaceName, p.listId
            FROM ({_fixture_record_sql(200)}) r
            CROSS JOIN (VALUES (CAST(11 AS BIGINT)), (22), (33)) p(listId)
        """,
        "csv_parse": """
            SELECT CAST(b * 100 + j AS VARCHAR) AS id,
                   'name_' || b || '_' || (b * 100 + j) AS name,
                   'v"q' AS quoted,
                   CASE WHEN (b * 100 + j) % 3 = 0
                        THEN CAST(b * 100 + j AS VARCHAR) END AS n1,
                   CASE WHEN (b * 100 + j) % 5 = 0 THEN '' END AS n2
            FROM range(8) blobs(b) CROSS JOIN range(100) rows(j)
        """,
        "activity_static_schema": """
            SELECT printf('guid%06d', i) AS marketoGUID,
                   CAST(i % 97 AS VARCHAR) AS leadId,
                   TIMESTAMP '2024-02-01 07:00:00' + ((i % 28) * INTERVAL 1 DAY)
                     AS activityDate,
                   CAST(i % 12 AS VARCHAR) AS activityTypeId,
                   CASE WHEN i % 5 = 0 THEN NULL
                        ELSE CAST(i % 40 AS VARCHAR) END AS campaignId,
                   CAST(i AS VARCHAR) AS primaryAttributeValueId,
                   'v' || i AS primaryAttributeValue,
                   '{"Source Type":"List import","n":' || i || '}' AS attributes
            FROM range(2000) t(i) WHERE i % 50 <> 0
        """,
        # --- text analysis (pure SQL decision-rule replica) ---
        "doc_langid": _langid_sql(),
        # --- non-SQL kernels: independently recomputed parquet oracles ---
        "doc_simhash": f"SELECT * FROM read_parquet('{oracle_paths['doc_simhash']}')",
        "doc_fingerprint": f"SELECT * FROM read_parquet('{oracle_paths['doc_fingerprint']}')",
        "doc_minhash_dup_pairs": (
            f"SELECT * FROM read_parquet('{oracle_paths['doc_minhash_dup_pairs']}')"
        ),
        "doc_dup_clusters": f"SELECT * FROM read_parquet('{oracle_paths['doc_dup_clusters']}')",
        "doc_pii_scan": f"""
            SELECT doc_id,
                   len(regexp_extract_all(coalesce(text,''), '{PII_EMAIL}'))::BIGINT AS n_emails,
                   len(regexp_extract_all(coalesce(text,''), '{PII_URL}'))::BIGINT AS n_urls,
                   len(regexp_extract_all(coalesce(text,''), '{PII_IPV4}'))::BIGINT AS n_ipv4,
                   (len(regexp_extract_all(coalesce(text,''), '{PII_EMAIL}'))
                    + len(regexp_extract_all(coalesce(text,''), '{PII_URL}'))
                    + len(regexp_extract_all(coalesce(text,''), '{PII_IPV4}'))) > 0 AS has_pii
            FROM documents
        """,
        "doc_pii_redact": f"""
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(coalesce(text,''), '{PII_EMAIL}', '<EMAIL>', 'g'),
                       '{PII_URL}', '<URL>', 'g'),
                     '{PII_IPV4}', '<IP>', 'g') AS text,
                   (len(regexp_extract_all(coalesce(text,''), '{PII_EMAIL}'))
                    + len(regexp_extract_all(coalesce(text,''), '{PII_URL}'))
                    + len(regexp_extract_all(coalesce(text,''), '{PII_IPV4}')))::BIGINT AS n_redactions
            FROM documents
        """,
        "doc_repetition": """
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            pos AS (
              SELECT doc_id, toks,
                     unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
              FROM t
            ),
            g AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM pos
            ),
            agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_grams,
                     count(DISTINCT gram)::BIGINT AS n_distinct_grams
              FROM g GROUP BY doc_id
            )
            SELECT t.doc_id,
                   coalesce(agg.n_grams, 0) AS n_grams,
                   coalesce(agg.n_distinct_grams, 0) AS n_distinct_grams,
                   CASE WHEN coalesce(agg.n_grams, 0) > 0
                        THEN 1.0 - (agg.n_distinct_grams::DOUBLE / agg.n_grams::DOUBLE)
                        ELSE 0.0 END AS rep_ratio
            FROM t LEFT JOIN agg USING (doc_id)
        """,
        "doc_simhash_dup_pairs": (
            f"SELECT * FROM read_parquet('{oracle_paths['doc_simhash_dup_pairs']}')"
        ),
        "doc_dedup_near": f"""
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (
              SELECT doc_id FROM read_parquet('{oracle_paths['doc_dup_clusters']}')
              WHERE doc_id != cluster_id)
        """,
        "doc_dedup_near_keep_best": f"""
            WITH members AS (
              SELECT doc_id, cluster_id
              FROM read_parquet('{oracle_paths['doc_dup_clusters']}')
            ),
            ranked AS (
              SELECT m.doc_id, m.cluster_id,
                     row_number() OVER (
                       PARTITION BY m.cluster_id
                       ORDER BY d.n_chars DESC, m.doc_id) AS rn
              FROM members m JOIN documents d USING (doc_id)
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
        """,
        "ann_lsh_topk": f"SELECT * FROM read_parquet('{oracle_paths['ann_lsh_topk']}')",
        "ann_ivf_topk": f"SELECT * FROM read_parquet('{oracle_paths['ann_ivf_topk']}')",
        "embedding_near_dup": (
            f"SELECT * FROM read_parquet('{oracle_paths['embedding_near_dup']}')"
        ),
        "embedding_dup_clusters": (
            f"SELECT * FROM read_parquet('{oracle_paths['embedding_dup_clusters']}')"
        ),
        # --- corpus split / curation / vocab (pure SQL) ---
        "doc_split": _doc_split_sql(),
        "doc_curation": _doc_curation_sql(),
        "doc_vocab_topk": f"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
              FROM documents
            )
            SELECT token, count(*) AS n FROM tok GROUP BY token
            ORDER BY n DESC, token LIMIT {VOCAB_TOP_K}
        """,
        "doc_heavy_hitters": f"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS token
              FROM documents
            ),
            tot AS (SELECT count(*)::BIGINT AS n_total FROM tok),
            c AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY token)
            SELECT c.token, c.n FROM c CROSS JOIN tot
            WHERE c.n * {HH_K} > tot.n_total
        """,
        "doc_topk_per_lang": rf"""
            WITH m AS (
              SELECT lang, doc_id,
                     len(regexp_extract_all(text, '\S+')) AS n_tokens_ws
              FROM documents
            )
            SELECT lang, doc_id, n_tokens_ws, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY lang ORDER BY n_tokens_ws DESC, doc_id) AS rank
              FROM m
            ) WHERE rank <= {GROUP_TOP_K}
        """,
        "ann_incremental_topk": (
            f"SELECT * FROM read_parquet('{oracle_paths['ann_incremental_topk']}')"
        ),
        "ann_incremental_topk_deletes": (
            "SELECT * FROM read_parquet("
            f"'{oracle_paths['ann_incremental_topk_deletes']}')"
        ),
        "doc_incremental_dedup": (
            f"SELECT * FROM read_parquet('{oracle_paths['doc_incremental_dedup']}')"
        ),
        "doc_incremental_dedup_deletes": (
            "SELECT * FROM read_parquet("
            f"'{oracle_paths['doc_incremental_dedup_deletes']}')"
        ),
        "multimodal_pipeline": (
            f"SELECT * FROM read_parquet('{oracle_paths['multimodal_pipeline']}')"
        ),
        "cdc_replay": f"""
            WITH e AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= TIMESTAMP '2024-01-01' AND event_ts <= {cdc_to}
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
              FROM e
            )
            SELECT repo, path, commit_seq, sha256(content) AS content_sha256
            FROM ranked WHERE rn = 1 AND op = 'upsert'
        """,
        # time travel: lake AS OF window 1's watermark == LWW over only
        # window-1 events ([from, to] inclusive; the engine re-pulls the
        # boundary second in window 2, idempotent under LWW)
        "time_travel": f"""
            WITH e AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= TIMESTAMP '2024-01-01' AND event_ts <= {cdc_w1_to}
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
              FROM e
            )
            SELECT repo, path, commit_seq, sha256(content) AS content_sha256
            FROM ranked WHERE rn = 1 AND op = 'upsert'
        """,
        # CDC feed out of the lake: per-key LATEST state (op kept,
        # deletes included) over exactly the second window's event range
        "cdc_feed": f"""
            WITH e AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= {cdc_w1_to} AND event_ts <= {cdc_to}
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
              FROM e
            )
            SELECT repo, path, commit_seq, op FROM ranked WHERE rn = 1
        """,
        # snapshot diff: keys whose LIVE state differs between the w1
        # and w2 snapshots (state-level FULL OUTER of the two LWW
        # heads; upsert-then-delete inside the range cancels out)
        "snapshot_diff": f"""
            WITH ev AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= TIMESTAMP '2024-01-01' AND event_ts <= {cdc_to}
            ),
            s1 AS (
              SELECT repo, path, commit_seq FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
                FROM ev WHERE event_ts <= {cdc_w1_to}
              ) WHERE rn = 1 AND op = 'upsert'
            ),
            s2 AS (
              SELECT repo, path, commit_seq FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
                FROM ev
              ) WHERE rn = 1 AND op = 'upsert'
            )
            SELECT coalesce(s1.repo, s2.repo) AS repo,
                   coalesce(s1.path, s2.path) AS path,
                   CASE WHEN s1.repo IS NULL THEN 'added'
                        WHEN s2.repo IS NULL THEN 'deleted'
                        ELSE 'modified' END AS change_kind,
                   s1.commit_seq AS old_seq, s2.commit_seq AS new_seq
            FROM s1 FULL OUTER JOIN s2
              ON s1.repo = s2.repo AND s1.path = s2.path
            WHERE s1.repo IS NULL OR s2.repo IS NULL
               OR s1.commit_seq != s2.commit_seq
        """,
        "repo_head_stats": f"""
            WITH e AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= TIMESTAMP '2024-01-01' AND event_ts <= {cdc_to}
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
              FROM e
            ),
            head AS (SELECT * FROM ranked WHERE rn = 1 AND op = 'upsert')
            SELECT repo, lang, CAST(sum(length(content)) AS BIGINT) AS n_bytes,
                   count(*) AS n_files, max(commit_seq) AS last_seq
            FROM head GROUP BY repo, lang
        """,
        "event_seasonality": """
            SELECT event_type,
                   isodow(ts)::BIGINT AS dow,
                   hour(ts)::BIGINT AS hour,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2, 3
        """,
        "cochange_kcore": (
            f"SELECT * FROM read_parquet('{oracle_paths['cochange_kcore']}')"
        ),
        "ship_lag_profile": """
            SELECT ((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                      // 86400000000)::BIGINT AS lag_days,
                   count(*)::BIGINT AS n_items
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "cdc_op_mix": f"""
            WITH g AS (
              SELECT make_timestamp(
                       (epoch_us(event_ts) - 1704067200000000)
                         // 604800000000 * 604800000000 + 1704067200000000
                     ) AS window_start,
                     op, count(*)::BIGINT AS n
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              GROUP BY 1, 2
            )
            SELECT window_start,
                   coalesce(sum(n) FILTER (WHERE op = 'upsert'), 0)::BIGINT AS n_upserts,
                   coalesce(sum(n) FILTER (WHERE op = 'delete'), 0)::BIGINT AS n_deletes,
                   (1000 * coalesce(sum(n) FILTER (WHERE op = 'delete'), 0)
                      // greatest(sum(n), 1))::BIGINT AS delete_pm
            FROM g GROUP BY 1
        """,
        "repo_tree_depth": f"""
            WITH e AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= TIMESTAMP '2024-01-01' AND event_ts <= {cdc_to}
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
              FROM e
            ),
            head AS (SELECT * FROM ranked WHERE rn = 1 AND op = 'upsert')
            SELECT repo,
                   (length(path) - length(replace(path, '/', '')) + 1)::BIGINT AS depth,
                   count(*)::BIGINT AS n_files
            FROM head GROUP BY 1, 2
        """,
        "cdc_parent_seq": f"""
            SELECT repo, path, commit_seq,
                   coalesce(lag(commit_seq) OVER (
                     PARTITION BY repo, path ORDER BY commit_seq), -1) AS parent_seq
            FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
        """,
        "doc_sample_stratified": f"""
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     (CAST(doc_id % {SPLIT_HASH_MOD} AS HUGEINT) * {SPLIT_HASH_MULT})
                       % {SPLIT_HASH_MOD} AS h
              FROM documents
            )
            WHERE h % 1000 < CASE lang {_sample_rate_cases} ELSE {SAMPLE_DEFAULT_PER_MILLE} END
        """,
        "doc_mix_sample": f"""
            WITH c AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
            tot AS (SELECT sum(n)::BIGINT AS n_total FROM c),
            r AS (
              SELECT c.lang,
                     least(1000, (1000 * (((tot.n_total * {MIX_BUDGET_PER_MILLE}) // 1000)
                       * (CASE c.lang {_mix_weight_cases} ELSE 0 END) // 1000)) // c.n) AS rate
              FROM c CROSS JOIN tot
            )
            SELECT d.doc_id, d.lang
            FROM documents d JOIN r ON d.lang = r.lang
            WHERE ((CAST(d.doc_id % {SPLIT_HASH_MOD} AS HUGEINT) * {SPLIT_HASH_MULT})
                     % {SPLIT_HASH_MOD}) % 1000 < r.rate
        """,
        "doc_global_shuffle": f"""
            SELECT doc_id, shard,
                   (row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1)
                     ::BIGINT AS pos
            FROM (
              SELECT doc_id,
                     CAST((CAST(doc_id % {SPLIT_HASH_MOD} AS HUGEINT) * {SHUFFLE_HASH_MULT})
                       % {SPLIT_HASH_MOD} AS BIGINT) AS h,
                     CAST(((CAST(doc_id % {SPLIT_HASH_MOD} AS HUGEINT) * {SHUFFLE_HASH_MULT})
                       % {SPLIT_HASH_MOD}) % {SHUFFLE_N_SHARDS} AS BIGINT) AS shard
              FROM documents
            )
        """,
        "doc_curation_quantile": rf"""
            WITH m AS (
              SELECT doc_id, lang,
                     len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS n_tokens
              FROM documents
            ),
            cut AS (
              SELECT lang, quantile_disc(n_tokens, {CURATION_QUANTILE_P}) AS c
              FROM m GROUP BY lang
            )
            SELECT m.doc_id, m.lang, m.n_tokens
            FROM m JOIN cut USING (lang)
            WHERE m.n_tokens >= cut.c
        """,
        "doc_source_report": rf"""
            SELECT source, lang, count(*)::BIGINT AS n_docs,
                   sum(len(regexp_extract_all(coalesce(text, ''), '\S+')))::BIGINT AS n_tokens,
                   sum(strlen(coalesce(text, '')))::BIGINT AS n_bytes
            FROM documents GROUP BY source, lang
        """,
        "lineitem_rollup": """
            SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_items,
                   sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "customer_nation_report": """
            SELECT n.n_name, count(*)::BIGINT AS n_customers,
                   sum(CASE WHEN c.c_acctbal > 0 THEN 1 ELSE 0 END)::BIGINT AS n_positive_bal
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "doc_boilerplate": f"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t WHERE len(toks) >= 3
              )
            ),
            df AS (SELECT gram, count(*)::BIGINT AS df FROM g GROUP BY gram)
            SELECT g.doc_id, count(*)::BIGINT AS n_grams,
                   sum(CASE WHEN df.df >= {BOILERPLATE_MIN_DF} THEN 1 ELSE 0 END)::BIGINT AS n_common
            FROM g JOIN df USING (gram)
            GROUP BY g.doc_id
        """,
        "doc_length_batches": rf"""
            SELECT doc_id, n_tokens, bucket,
                   ((row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
                     // {LENBATCH_DOCS_PER_BATCH})::BIGINT AS batch_id
            FROM (
              SELECT doc_id,
                     len(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS n_tokens,
                     (len(regexp_extract_all(coalesce(text, ''), '\S+'))
                       // {LENBATCH_BUCKET_TOKENS})::BIGINT AS bucket
              FROM documents
            )
        """,
        "evolved_attrs": f"""
            WITH e AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= TIMESTAMP '2024-01-01' AND event_ts <= {cdc_to}
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
              FROM e
            ),
            head AS (SELECT * FROM ranked WHERE rn = 1 AND op = 'upsert')
            SELECT repo, path, commit_seq,
                   CAST(nullif(nullif(attr_score, ''), 'null') AS DOUBLE) AS mk_score,
                   CAST(nullif(nullif(attr_revenue, ''), 'null') AS DOUBLE) AS mk_revenue,
                   lower(nullif(nullif(attr_active, ''), 'null')) = 'true' AS mk_active,
                   CAST(strptime(nullif(nullif(attr_updated, ''), 'null'),
                                 '%Y-%m-%dT%H:%M:%S%z') AS TIMESTAMP) AS mk_updated
            FROM head
        """,
        "key_lookup": f"""
            WITH e AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= TIMESTAMP '2024-01-01' AND event_ts <= {cdc_to}
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
              FROM e
            )
            SELECT repo, path, commit_seq, sha256(content) AS content_sha256
            FROM ranked WHERE rn = 1 AND op = 'upsert'
              AND (repo, path) IN ({_lookup_key_rows})
        """,
        "commit_windows": f"""
            SELECT repo, CAST(commit_seq // {COMMIT_WINDOW_SECONDS} AS BIGINT) AS win,
                   count(*) AS n_events, count(DISTINCT path) AS n_paths
            FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            GROUP BY repo, win
        """,
        "co_change_pairs": f"""
            WITH d AS (
              SELECT DISTINCT repo, CAST(commit_seq // {COMMIT_WINDOW_SECONDS} AS BIGINT) AS win, path
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            )
            SELECT a.repo, a.path AS path_a, b.path AS path_b,
                   count(*) AS n_windows
            FROM d a JOIN d b ON a.repo = b.repo AND a.win = b.win AND a.path < b.path
            GROUP BY a.repo, a.path, b.path
            HAVING count(*) >= {CO_CHANGE_MIN_WINDOWS}
        """,
        "doc_containment_pairs": f"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            long AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t WHERE len(toks) >= 3
              )
            ),
            short AS (
              SELECT doc_id, array_to_string(toks, ' ') AS gram
              FROM t WHERE len(toks) BETWEEN 1 AND 2
            ),
            g AS (
              SELECT DISTINCT doc_id, gram
              FROM (SELECT * FROM long UNION ALL SELECT * FROM short)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            ab AS (
              SELECT inter.a, inter.b, inter.i, sa.n AS na, sb.n AS nb
              FROM inter
              JOIN sizes sa ON sa.doc_id = inter.a
              JOIN sizes sb ON sb.doc_id = inter.b
            )
            SELECT a AS doc_id, b AS contained_in FROM ab
            WHERE {CONTAIN_DEN} * i >= {CONTAIN_NUM} * na
            UNION ALL
            SELECT b AS doc_id, a AS contained_in FROM ab
            WHERE {CONTAIN_DEN} * i >= {CONTAIN_NUM} * nb
        """,
        "doc_split_leakage_safe": f"""
            WITH clusters AS (
              SELECT * FROM read_parquet('{oracle_paths['doc_dup_clusters']}')
            ),
            keyed AS (
              SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS k
              FROM documents d LEFT JOIN clusters c ON c.doc_id = d.doc_id
            )
            SELECT doc_id,
                   CASE WHEN h < {SPLIT_TRAIN_CUT} THEN 'train'
                        WHEN h < {SPLIT_VAL_CUT} THEN 'val'
                        ELSE 'test' END AS split
            FROM (
              SELECT doc_id,
                     (CAST(k % {SPLIT_HASH_MOD} AS HUGEINT) * {SPLIT_HASH_MULT})
                       % {SPLIT_HASH_MOD} AS h
              FROM keyed
            )
        """,
        "doc_global_rank": """
            SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                   row_number() OVER (ORDER BY n_chars, doc_id) AS global_rank
            FROM documents
        """,
        "token_coverage_curve": r"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS token
              FROM documents
            ),
            c AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY 1),
            ranked AS (
              SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rn,
                     sum(n) OVER () AS total,
                     count(*) OVER () AS n_types
              FROM c
            ),
            ks AS (SELECT 100 AS k UNION ALL SELECT 1000 UNION ALL SELECT 10000)
            SELECT least(ks.k, max(ranked.n_types))::BIGINT AS k,
                   (1000 * sum(ranked.n) FILTER (WHERE ranked.rn <= ks.k)
                      // greatest(max(ranked.total), 1))::BIGINT AS covered_pm
            FROM ks CROSS JOIN ranked
            GROUP BY ks.k
        """,
        "minhash_precision_report": f"""
            WITH approx AS (
              SELECT greatest(doc_id, dup_of) AS a, least(doc_id, dup_of) AS b
              FROM read_parquet('{oracle_paths['doc_minhash_dup_pairs']}')
            ),
            t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            long AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t WHERE len(toks) >= 3
              )
            ),
            short AS (
              SELECT doc_id, array_to_string(toks, ' ') AS gram
              FROM t WHERE len(toks) BETWEEN 1 AND 2
            ),
            g AS (
              SELECT DISTINCT doc_id, gram
              FROM (SELECT * FROM long UNION ALL SELECT * FROM short)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS i
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            exact AS (
              SELECT greatest(inter.x, inter.y) AS a, least(inter.x, inter.y) AS b
              FROM inter
              JOIN sizes sa ON sa.doc_id = inter.x
              JOIN sizes sb ON sb.doc_id = inter.y
              WHERE 2 * inter.i >= sa.n + sb.n - inter.i
            ),
            m AS (
              SELECT count(*) FILTER (WHERE e.a IS NOT NULL)::BIGINT AS tp,
                     count(*) FILTER (WHERE e.a IS NULL)::BIGINT AS fp
              FROM approx ap LEFT JOIN exact e ON e.a = ap.a AND e.b = ap.b
            ),
            fn_t AS (
              SELECT count(*)::BIGINT AS fn
              FROM exact e LEFT JOIN approx ap ON e.a = ap.a AND e.b = ap.b
              WHERE ap.a IS NULL
            )
            SELECT m.tp, m.fp, fn_t.fn,
                   (1000 * m.tp // greatest(m.tp + m.fp, 1))::BIGINT AS precision_pm,
                   (1000 * m.tp // greatest(m.tp + fn_t.fn, 1))::BIGINT AS recall_pm
            FROM m, fn_t
        """,
        "vocab_gini": r"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS token
              FROM documents
            ),
            c AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY 1),
            ranked AS (
              SELECT n, row_number() OVER (ORDER BY n) AS rn,
                     count(*) OVER () AS n_tokens,
                     sum(n) OVER () AS total
              FROM c
            )
            SELECT max(n_tokens)::BIGINT AS n_tokens,
                   max(total)::BIGINT AS total_count,
                   sum((2 * rn - 1 - n_tokens) * n)::BIGINT AS gini_num,
                   (1000 * sum((2 * rn - 1 - n_tokens) * n)
                     // greatest(max(n_tokens) * max(total), 1))::BIGINT AS gini_pm
            FROM ranked
        """,
        "doc_max_overlap": f"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            long AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t WHERE len(toks) >= 3
              )
            ),
            short AS (
              SELECT doc_id, array_to_string(toks, ' ') AS gram
              FROM t WHERE len(toks) BETWEEN 1 AND 2
            ),
            g AS (
              SELECT DISTINCT doc_id, gram
              FROM (SELECT * FROM long UNION ALL SELECT * FROM short)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS a, b.doc_id AS b, count(*)::BIGINT AS i
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ),
            dirs AS (
              SELECT a AS doc_id, i, b AS partner FROM inter
              UNION ALL
              SELECT b AS doc_id, i, a AS partner FROM inter
            )
            SELECT d.doc_id, s.n AS n_grams,
                   max(d.i * {OVERLAP_PACK} + ({OVERLAP_PACK} - 1 - d.partner))
                       // {OVERLAP_PACK} AS max_shared,
                   {OVERLAP_PACK} - 1
                     - max(d.i * {OVERLAP_PACK} + ({OVERLAP_PACK} - 1 - d.partner))
                       % {OVERLAP_PACK} AS best_partner
            FROM dirs d JOIN sizes s ON s.doc_id = d.doc_id
            GROUP BY 1, 2
        """,
        "customer_pareto": f"""
            WITH pc AS (
              SELECT o.o_custkey AS ckey,
                     sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                        )::BIGINT AS rev_c
              FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
              GROUP BY 1
            ),
            walk AS (
              SELECT rev_c,
                     sum(rev_c) OVER (ORDER BY rev_c DESC, ckey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                     sum(rev_c) OVER () AS total,
                     row_number() OVER (ORDER BY rev_c DESC, ckey ASC) AS rn,
                     count(*) OVER () AS n_all
              FROM pc
            )
            SELECT rn AS n_customers, n_all::BIGINT AS total_customers,
                   (1000 * cum // total)::BIGINT AS share_pm
            FROM walk
            WHERE cum * 1000 >= {PARETO_TARGET_PM} * total
            ORDER BY rn LIMIT 1
        """,
        "event_anomaly_days": f"""
            WITH d AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            ),
            m AS (
              SELECT event_type, day, n,
                     CAST(2 * median(n) OVER (
                         PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN {ROLLMED_WINDOW - 1} PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS median7_x2
              FROM d
            )
            SELECT * FROM m
            WHERE 2 * {ANOMALY_T_DEN} * n > {ANOMALY_T_NUM} * median7_x2
        """,
        "source_lang_drift": """
            WITH g AS (
              SELECT source, lang, count(*)::BIGINT AS n
              FROM documents GROUP BY 1, 2
            ),
            s AS (SELECT source, sum(n)::BIGINT AS n_s FROM g GROUP BY 1),
            l AS (SELECT lang, sum(n)::BIGINT AS n_l FROM g GROUP BY 1),
            t AS (SELECT sum(n)::BIGINT AS total FROM g)
            SELECT s.source, s.n_s AS n_docs,
                   sum(abs(coalesce(g.n, 0) * t.total - l.n_l * s.n_s))::BIGINT
                       AS l1_cross
            FROM s CROSS JOIN l CROSS JOIN t
            LEFT JOIN g ON g.source = s.source AND g.lang = l.lang
            GROUP BY 1, 2
        """,
        "event_rolling_median": f"""
            WITH d AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            )
            SELECT event_type, day, n,
                   CAST(2 * median(n) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN {ROLLMED_WINDOW - 1} PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS median7_x2
            FROM d
        """,
        "doc_jaccard_pairs": """
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            long AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t WHERE len(toks) >= 3
              )
            ),
            short AS (
              SELECT doc_id, array_to_string(toks, ' ') AS gram
              FROM t WHERE len(toks) BETWEEN 1 AND 2
            ),
            g AS (
              SELECT DISTINCT doc_id, gram
              FROM (SELECT * FROM long UNION ALL SELECT * FROM short)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_id, b.doc_id AS dup_of, count(*) AS i
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT inter.doc_id, inter.dup_of
            FROM inter
            JOIN sizes sa ON sa.doc_id = inter.doc_id
            JOIN sizes sb ON sb.doc_id = inter.dup_of
            WHERE 2 * i >= sa.n + sb.n - i
        """,
        "event_asof_join": """
            WITH m AS (
              SELECT user_id, ts AS purchase_ts FROM events
              WHERE event_type = 'purchase'
            )
            SELECT e.event_id, e.user_id, e.ts, e.event_type,
                   m.purchase_ts AS last_purchase_ts,
                   date_diff('microsecond', m.purchase_ts, e.ts)::BIGINT AS lag_us
            FROM events e ASOF LEFT JOIN m
              ON e.user_id = m.user_id AND e.ts >= m.purchase_ts
        """,
        "event_range_join": f"""
            SELECT p.event_id, p.user_id, p.ts,
                   count(e.event_id)::BIGINT AS n_follow
            FROM events p LEFT JOIN events e
              ON e.user_id = p.user_id
             AND e.ts > p.ts
             AND e.ts <= p.ts + INTERVAL {RANGE_JOIN_SECONDS} SECONDS
            WHERE p.event_type = 'purchase'
            GROUP BY p.event_id, p.user_id, p.ts
        """,
        "doc_dup_windows": f"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ts
              FROM documents
            ),
            w AS (
              SELECT doc_id,
                     unnest([array_to_string(ts[i:i+{DUPWIN_W - 1}], ' ')
                             for i in range(1, greatest(len(ts) - {DUPWIN_W} + 2, 1))]) AS gram
              FROM tok
            ),
            per_doc AS (
              SELECT gram, doc_id, count(*)::BIGINT AS k FROM w GROUP BY gram, doc_id
            )
            SELECT gram, count(*)::BIGINT AS n_docs, sum(k)::BIGINT AS n_occ
            FROM per_doc GROUP BY gram HAVING count(*) >= {DUPWIN_MIN_DOCS}
        """,
        "doc_dup_coverage": f"""
            WITH tok AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ts
              FROM documents
            ),
            w AS (
              SELECT doc_id,
                     unnest(range(1, greatest(len(ts) - {DUPWIN_W} + 2, 1))) AS i,
                     unnest([array_to_string(ts[j:j+{DUPWIN_W - 1}], ' ')
                             for j in range(1, greatest(len(ts) - {DUPWIN_W} + 2, 1))]) AS gram
              FROM tok
            ),
            rep AS (
              SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS c FROM w GROUP BY gram
              ) WHERE c >= {DUPWIN_MIN_DOCS}
            ),
            hits AS (SELECT w.doc_id, w.i FROM w JOIN rep USING (gram)),
            cov AS (
              SELECT doc_id, count(DISTINCT pos)::BIGINT AS covered
              FROM (SELECT doc_id, unnest(range(i, i + {DUPWIN_W})) AS pos FROM hits)
              GROUP BY doc_id
            )
            SELECT tok.doc_id,
                   len(tok.ts)::BIGINT AS n_tokens,
                   coalesce(cov.covered, 0)::BIGINT AS covered,
                   CASE WHEN len(tok.ts) > 0
                        THEN coalesce(cov.covered, 0)::DOUBLE / len(tok.ts)::DOUBLE
                        ELSE 0.0 END AS dup_ratio
            FROM tok LEFT JOIN cov USING (doc_id)
        """,
        "lang_token_quantiles": f"""
            WITH m AS (
              SELECT lang,
                     len(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT AS n
              FROM documents
            ),
            qs AS (
              SELECT lang,
                     quantile_disc(n, {list(TOKEN_QUANTILE_PS)}) AS v
              FROM m GROUP BY lang
            )
            SELECT lang,
                   unnest({list(TOKEN_QUANTILE_PS)}) AS p,
                   unnest(v) AS n_tokens
            FROM qs
        """,
        "token_packing": f"""
            WITH m AS (
              SELECT doc_id, lang,
                     len(regexp_extract_all(coalesce(text, ''), '\\S+'))::BIGINT AS n_tokens
              FROM documents
            ),
            o AS (
              SELECT doc_id, lang, n_tokens,
                     (sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                      - n_tokens)::BIGINT AS start_off
              FROM m
            )
            SELECT doc_id, lang, n_tokens, start_off,
                   (start_off // {PACK_SEQ_LEN})::BIGINT AS first_seq,
                   CASE WHEN n_tokens > 0
                        THEN ((start_off + n_tokens - 1) // {PACK_SEQ_LEN})::BIGINT
                        ELSE (start_off // {PACK_SEQ_LEN})::BIGINT END AS last_seq
            FROM o
        """,
        "doc_keyterms": f"""
            WITH pairs AS (
              SELECT doc_id, token, count(*)::BIGINT AS tf
              FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS token
                FROM documents
              )
              GROUP BY doc_id, token
            ),
            df AS (SELECT token, count(*)::BIGINT AS df FROM pairs GROUP BY token),
            ranked AS (
              SELECT p.doc_id, p.token, p.tf, df.df,
                     row_number() OVER (
                       PARTITION BY p.doc_id
                       ORDER BY df.df ASC, p.tf DESC, p.token ASC
                     )::BIGINT AS rank
              FROM pairs p JOIN df USING (token)
            )
            SELECT doc_id, token, tf, df, rank
            FROM ranked WHERE rank <= {KEYTERMS_TOP_K}
        """,
        "event_hop_windows": f"""
            WITH w AS (
              SELECT event_type, user_id,
                     (epoch_us(ts) // {HOP_SECONDS * 1_000_000})
                       * {HOP_SECONDS * 1_000_000}
                       - k.k * {HOP_SECONDS * 1_000_000} AS window_start_us
              FROM events
              CROSS JOIN (
                SELECT unnest(range({HOP_WINDOW_SECONDS // HOP_SECONDS})) AS k
              ) k
            )
            SELECT window_start_us, event_type,
                   count(*)::BIGINT AS n_events,
                   count(DISTINCT user_id)::BIGINT AS n_users
            FROM w GROUP BY window_start_us, event_type
        """,
        "bigram_collocations": f"""
            WITH tok AS (
              SELECT regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS ts
              FROM documents
            ),
            big AS (
              SELECT unnest(ts[1:len(ts)-1]) AS t1, unnest(ts[2:len(ts)]) AS t2
              FROM tok WHERE len(ts) >= 2
            ),
            uni AS (SELECT unnest(ts) AS token FROM tok),
            cx AS (SELECT token, count(*)::BIGINT AS n FROM uni GROUP BY token),
            cxy AS (SELECT t1, t2, count(*)::BIGINT AS n_xy FROM big GROUP BY t1, t2),
            tot AS (SELECT count(*)::BIGINT AS n FROM uni)
            SELECT cxy.t1, cxy.t2, cxy.n_xy, cx1.n AS n_x, cx2.n AS n_y
            FROM cxy
            JOIN cx cx1 ON cx1.token = cxy.t1
            JOIN cx cx2 ON cx2.token = cxy.t2
            CROSS JOIN tot
            WHERE cxy.n_xy >= {COLLOC_MIN_PAIR}
              AND cxy.n_xy * tot.n >= {COLLOC_LIFT} * cx1.n * cx2.n
        """,
        "event_funnel": f"""
            WITH s1 AS (
              SELECT user_id, min(ts) AS t FROM events
              WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s1 ON e.user_id = s1.user_id
              WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts >= s1.t
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, min(e.ts) AS t
              FROM events e JOIN s2 ON e.user_id = s2.user_id
              WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts >= s2.t
              GROUP BY e.user_id
            )
            SELECT '{FUNNEL_STAGES[0]}' AS stage, 1::BIGINT AS stage_idx,
                   count(*)::BIGINT AS users FROM s1
            UNION ALL
            SELECT '{FUNNEL_STAGES[1]}', 2::BIGINT, count(*)::BIGINT FROM s2
            UNION ALL
            SELECT '{FUNNEL_STAGES[2]}', 3::BIGINT, count(*)::BIGINT FROM s3
        """,
        "embedding_outliers": (
            f"SELECT * FROM read_parquet('{oracle_paths['embedding_outliers']}')"
        ),
        "approx_distinct_users": (
            f"SELECT * FROM read_parquet('{oracle_paths['approx_distinct_users']}')"
        ),
        "value_quantile_sketch": (
            f"SELECT * FROM read_parquet('{oracle_paths['value_quantile_sketch']}')"
        ),
        "doc_compression_ratio": (
            f"SELECT * FROM read_parquet('{oracle_paths['doc_compression_ratio']}')"
        ),
        "event_dedup_window": (
            f"SELECT * FROM read_parquet('{oracle_paths['event_dedup_window']}')"
        ),
        "order_priority_report": f"""
            SELECT l_returnflag,
                   sum(CASE WHEN o_orderpriority IN
                       {tuple(HIGH_PRIORITIES)!r} THEN 1 ELSE 0 END)::BIGINT
                     AS high_line_count,
                   sum(CASE WHEN o_orderpriority IN
                       {tuple(HIGH_PRIORITIES)!r} THEN 0 ELSE 1 END)::BIGINT
                     AS low_line_count
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY l_returnflag
        """,
        "event_rolling_stats": f"""
            SELECT event_id, user_id, ts,
                   row_number() OVER w::BIGINT AS row_in_user,
                   least(row_number() OVER w, {ROLLING_WINDOW_ROWS})::BIGINT
                     AS win_rows,
                   max(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {ROLLING_WINDOW_ROWS - 1} PRECEDING
                       AND CURRENT ROW
                   ) AS win_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "customer_anti_join": f"""
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > {ANTI_JOIN_PRICE}
            )
        """,
        "user_retention": """
            WITH f AS (
              SELECT user_id, min(date_trunc('day', ts)) AS cohort
              FROM events GROUP BY user_id
            ),
            a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
            j AS (
              SELECT a.user_id, f.cohort,
                     date_diff('day', f.cohort, a.day)::BIGINT AS day_offset
              FROM a JOIN f USING (user_id)
            )
            SELECT cohort AS cohort_day, day_offset, count(*)::BIGINT AS users
            FROM j GROUP BY cohort, day_offset
        """,
        "doc_chunks": f"""
            WITH t AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))::BIGINT
                       AS n_tok
              FROM documents
            ),
            b AS (
              SELECT doc_id, n_tok,
                     (greatest(n_tok - {CHUNK_OVERLAP}, 1) + {CHUNK_STRIDE - 1})
                       // {CHUNK_STRIDE} AS n_chunks
              FROM t
            ),
            e AS (
              SELECT doc_id, n_tok, unnest(range(n_chunks))::BIGINT AS chunk_idx
              FROM b
            )
            SELECT doc_id, chunk_idx,
                   chunk_idx * {CHUNK_STRIDE} AS start_tok,
                   least({CHUNK_TOKENS}::BIGINT,
                         n_tok - chunk_idx * {CHUNK_STRIDE}) AS chunk_tokens
            FROM e
        """,
        "doc_decontaminate_bloom": f"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t WHERE len(toks) >= 3
              )
            ),
            bench AS (
              SELECT DISTINCT gram FROM g WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
            )
            SELECT g.doc_id, count(DISTINCT g.gram)::BIGINT AS n_hits
            FROM g JOIN bench USING (gram)
            WHERE g.doc_id % {DECONTAM_BENCH_MOD} <> 0
            GROUP BY g.doc_id
        """,
        "doc_decontaminate": f"""
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t WHERE len(toks) >= 3
              )
            ),
            bench AS (
              SELECT DISTINCT gram FROM g WHERE doc_id % {DECONTAM_BENCH_MOD} = 0
            ),
            hits AS (
              SELECT g.doc_id, count(DISTINCT g.gram)::BIGINT AS n_hits
              FROM g JOIN bench USING (gram)
              WHERE g.doc_id % {DECONTAM_BENCH_MOD} <> 0
              GROUP BY g.doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n_hits, 0)::BIGINT AS n_hits,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % {DECONTAM_BENCH_MOD} <> 0
        """,
        "token_quantiles": " UNION ALL ".join(
            f"""
            SELECT {p!r}::DOUBLE AS p,
                   quantile_disc(len(regexp_extract_all(coalesce(text, ''), '\\S+')), {p!r})::BIGINT AS n_tokens
            FROM documents
            """
            for p in TOKEN_QUANTILE_PS
        ),
        "doc_token_rarity": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS token
              FROM documents
            ),
            cnt AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY token)
            SELECT t.doc_id,
                   count(*)::BIGINT AS n_tokens,
                   sum(c.n)::BIGINT AS sum_freq,
                   min(c.n)::BIGINT AS min_tok_freq,
                   sum(c.n)::DOUBLE / count(*)::DOUBLE AS mean_tok_freq
            FROM tok t JOIN cnt c USING (token)
            GROUP BY t.doc_id
        """,
        "repo_churn_topk": f"""
            WITH c AS (
              SELECT repo, path, count(*) AS n_changes
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              GROUP BY repo, path
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo ORDER BY n_changes DESC, path) AS rank
              FROM c
            )
            SELECT repo, path, n_changes, rank FROM r WHERE rank <= {CHURN_TOP_K}
        """,
        "watermark_slice": f"""
            SELECT event_id, ts, user_id, event_type FROM events
            WHERE ts >= TIMESTAMP '{SLICE_FROM}' AND ts <= TIMESTAMP '{SLICE_TO}'
        """,
        "lww_latest": """
            SELECT user_id, event_type, max(event_id) AS last_event_id
            FROM events GROUP BY user_id, event_type
        """,
        "dedup_first": """
            SELECT user_id, event_type, min(event_id) AS first_event_id
            FROM events GROUP BY user_id, event_type
        """,
        "incremental_counts": """
            SELECT event_type, date_trunc('day', ts) AS day,
                   count(*) AS n_events,
                   min(event_id) AS min_event_id,
                   max(event_id) AS max_event_id
            FROM events GROUP BY event_type, date_trunc('day', ts)
        """,
        "enrich_join": """
            SELECT n.n_name AS nation, count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "semi_join": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey < 5)
        """,
        "included_fields": """
            SELECT c_custkey AS mk_c_custkey, c_name AS mk_c_name,
                   c_nationkey AS mk_c_nationkey
            FROM customer
        """,
        "preview_limit": """
            SELECT event_id, user_id, event_type FROM events
            ORDER BY event_id LIMIT 15
        """,
        "distinct_values": """
            SELECT DISTINCT event_type FROM events ORDER BY event_type
        """,
        "union_slices": """
            SELECT event_id, ts, event_type FROM events
            WHERE ts >= TIMESTAMP '2024-01-02' AND ts <= TIMESTAMP '2024-01-04'
            UNION ALL
            SELECT event_id, ts, event_type FROM events
            WHERE ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-12'
        """,
        "json_extract": """
            SELECT event_id,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
            FROM events
        """,
        "session_windows": """
            WITH ordered AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                          OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            tagged AS (
              SELECT *, sum(new_session) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS session_no
              FROM ordered
            )
            SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
                   min(event_id) AS first_event_id
            FROM tagged GROUP BY user_id, session_no
        """,
        "doc_dedup_exact": """
            SELECT sha256(text) AS text_sha256, min(doc_id) AS doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY sha256(text)
        """,
        "doc_tokens": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tokens_ws,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                     AS n_tokens_bpe
            FROM documents
        """,
        "doc_quality": r"""
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(regexp_extract_all(text, '\S+')) AS n_words,
                   len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
            FROM documents
        """,
        "ann_topk": f"""
            WITH q AS (
              SELECT vec_id AS qid, embedding AS qe FROM embeddings
              WHERE vec_id < {ANN_NUM_QUERIES}
            ),
            s AS (
              SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, e.embedding) AS cos
              FROM q CROSS JOIN embeddings e
            ),
            r AS (
              SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
              FROM s
            )
            SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {ANN_TOP_K}
        """,
        "scd2_history": f"""
            SELECT repo, path, commit_seq, op,
                   row_number() OVER w::BIGINT AS version_no,
                   coalesce(lead(commit_seq) OVER w, -1)::BIGINT AS valid_to_seq,
                   CAST(lead(commit_seq) OVER w IS NULL AND op <> 'delete'
                        AS BIGINT) AS is_current
            FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            WINDOW w AS (PARTITION BY repo, path ORDER BY commit_seq)
        """,
        "version_retention": f"""
            SELECT repo, path, commit_seq, rn FROM (
              SELECT repo, path, commit_seq,
                     row_number() OVER (
                       PARTITION BY repo, path ORDER BY commit_seq DESC
                     )::BIGINT AS rn
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            ) WHERE rn <= {RETENTION_KEEP_N}
        """,
        "dq_audit": """
            SELECT 'customer_null_name' AS check_name,
                   count(*) FILTER (WHERE c_name IS NULL)::BIGINT AS bad_rows
            FROM customer
            UNION ALL
            SELECT 'lineitem_nonpositive_qty',
                   count(*) FILTER (WHERE l_quantity <= 0)::BIGINT
            FROM lineitem
            UNION ALL
            SELECT 'orders_orphan_custkey', count(*)::BIGINT FROM orders o
            WHERE NOT EXISTS (
              SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
            )
            UNION ALL
            SELECT 'orders_dup_orderkey', count(*)::BIGINT FROM (
              SELECT o_orderkey FROM orders
              GROUP BY o_orderkey HAVING count(*) > 1
            )
        """,
        "lineitem_rollup_levels": f"""
            SELECT coalesce(l_returnflag, '{ROLLUP_ALL}') AS l_returnflag,
                   coalesce(l_linestatus, '{ROLLUP_ALL}') AS l_linestatus,
                   count(*)::BIGINT AS n_rows,
                   sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "shipping_priority": f"""
            SELECT l_orderkey, revenue_c100, o_orderdate FROM (
              SELECT l.l_orderkey,
                     sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                        )::BIGINT AS revenue_c100,
                     o.o_orderdate
              FROM customer c
              JOIN orders o ON c.c_custkey = o.o_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE c.c_mktsegment = '{Q3_SEGMENT}'
                AND o.o_orderdate < TIMESTAMP '1998-06-01'
                AND l.l_shipdate > TIMESTAMP '1998-06-01'
              GROUP BY l.l_orderkey, o.o_orderdate
            )
            ORDER BY revenue_c100 DESC, l_orderkey
            LIMIT {Q3_TOP_K}
        """,
        "cdc_before_image": f"""
            SELECT repo, path, commit_seq, op, "commit",
                   coalesce(lag("commit") OVER w, '') AS prev_commit,
                   coalesce(lag(commit_seq) OVER w, -1)::BIGINT AS prev_seq
            FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            WINDOW w AS (PARTITION BY repo, path ORDER BY commit_seq)
        """,
        "incremental_view": f"""
            WITH ev AS (
              SELECT * FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              WHERE event_ts >= TIMESTAMP '2024-01-01' AND event_ts <= {cdc_to}
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY repo, path ORDER BY commit_seq DESC) AS rn
              FROM ev
            ),
            head AS (SELECT * FROM ranked WHERE rn = 1 AND op = 'upsert')
            SELECT repo, count(*)::BIGINT AS n_live,
                   sum(commit_seq)::BIGINT AS sum_head_seq
            FROM head GROUP BY repo
        """,
        "local_supplier_volume": f"""
            SELECT n_name,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                      )::BIGINT AS revenue_c100
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
                           AND s.s_nationkey = c.c_nationkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = '{Q5_REGION}'
              AND o.o_orderdate >= TIMESTAMP '{str(Q5_FROM).replace("T", " ")}'
              AND o.o_orderdate < TIMESTAMP '{str(Q5_TO).replace("T", " ")}'
            GROUP BY n_name
        """,
        "large_orders": f"""
            SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
                   CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_totalprice_c,
                   t.total_qty
            FROM orders o
            JOIN (
              SELECT l_orderkey,
                     sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING total_qty > {Q18_MIN_QTY}
            ) t ON t.l_orderkey = o.o_orderkey
        """,
        "embedding_kmeans": f"""
            WITH q AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> floor(CAST(x AS DOUBLE) * {KMEANS_SCALE})) AS qv
              FROM embeddings
            ),
            c AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, qv AS cv
              FROM q ORDER BY vec_id LIMIT {KMEANS_K}
            ),
            d AS (
              SELECT q.vec_id, c.cluster,
                     CAST(list_inner_product(q.qv, q.qv)
                        - 2 * list_inner_product(q.qv, c.cv)
                        + list_inner_product(c.cv, c.cv) AS BIGINT) AS sq_dist
              FROM q CROSS JOIN c
            ),
            best AS (
              SELECT vec_id, cluster, sq_dist,
                     row_number() OVER (
                       PARTITION BY vec_id ORDER BY sq_dist, cluster) AS rn
              FROM d
            )
            SELECT vec_id, cluster::BIGINT AS cluster, sq_dist
            FROM best WHERE rn = 1
        """,
        "cochange_triangles": f"""
            WITH d AS (
              SELECT DISTINCT repo,
                     CAST(commit_seq // {COMMIT_WINDOW_SECONDS} AS BIGINT) AS win,
                     path
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            ),
            edges AS (
              SELECT a.repo, a.path AS pa, b.path AS pb
              FROM d a JOIN d b
                ON a.repo = b.repo AND a.win = b.win AND a.path < b.path
              GROUP BY a.repo, a.path, b.path
              HAVING count(*) >= {CO_CHANGE_MIN_WINDOWS}
            ),
            tri AS (
              SELECT e1.repo, e1.pa AS a, e1.pb AS b, e2.pb AS c
              FROM edges e1
              JOIN edges e2 ON e2.repo = e1.repo AND e2.pa = e1.pb
              JOIN edges e3 ON e3.repo = e1.repo AND e3.pa = e1.pa
                           AND e3.pb = e2.pb
            )
            SELECT repo, path, count(*)::BIGINT AS n_triangles FROM (
              SELECT repo, a AS path FROM tri
              UNION ALL SELECT repo, b FROM tri
              UNION ALL SELECT repo, c FROM tri
            ) GROUP BY repo, path
        """,
        "bpe_pair_stats": f"""
            WITH s AS (
              SELECT lower(coalesce(text, '')) AS t FROM documents
            ),
            p AS (
              SELECT substr(t, i, 2) AS pair
              FROM (
                SELECT t, unnest(range(1, greatest(len(t), 1))) AS i FROM s
              )
              WHERE regexp_matches(substr(t, i, 2), '^[a-z]{{2}}$')
            )
            SELECT pair, count(*)::BIGINT AS n FROM p
            GROUP BY pair ORDER BY n DESC, pair LIMIT {BPE_TOP_K}
        """,
        "embedding_kmeans_refine": f"""
            WITH q AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> floor(CAST(x AS DOUBLE) * {KMEANS_SCALE})) AS qv
              FROM embeddings
            ),
            c AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, qv AS cv
              FROM q ORDER BY vec_id LIMIT {KMEANS_K}
            ),
            a1 AS (
              SELECT vec_id, cluster FROM (
                SELECT q.vec_id, c.cluster,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                         list_inner_product(q.qv, q.qv)
                           - 2 * list_inner_product(q.qv, c.cv)
                           + list_inner_product(c.cv, c.cv),
                         c.cluster) AS rn
                FROM q CROSS JOIN c
              ) WHERE rn = 1
            ),
            dims AS (
              SELECT unnest(range(1,
                (SELECT max(len(qv)) FROM q) + 1)) AS i
            ),
            sums AS (
              SELECT a1.cluster, d.i,
                     sum(CAST(q.qv[d.i] AS BIGINT)) AS s,
                     count(*) AS n
              FROM a1 JOIN q USING (vec_id) CROSS JOIN dims d
              GROUP BY a1.cluster, d.i
            ),
            newc AS (
              SELECT cluster,
                     list(CAST(floor(CAST(s AS DOUBLE) / n) AS DOUBLE)
                          ORDER BY i) AS cv
              FROM sums GROUP BY cluster
            ),
            c2 AS (
              SELECT c.cluster, coalesce(n.cv, c.cv) AS cv
              FROM c LEFT JOIN newc n USING (cluster)
            ),
            a2 AS (
              SELECT vec_id, cluster FROM (
                SELECT q.vec_id, c2.cluster,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                         list_inner_product(q.qv, q.qv)
                           - 2 * list_inner_product(q.qv, c2.cv)
                           + list_inner_product(c2.cv, c2.cv),
                         c2.cluster) AS rn
                FROM q CROSS JOIN c2
              ) WHERE rn = 1
            )
            SELECT a2.vec_id, a2.cluster::BIGINT AS cluster,
                   (CASE WHEN a1.cluster <> a2.cluster
                         THEN 1 ELSE 0 END)::BIGINT AS moved
            FROM a2 JOIN a1 USING (vec_id)
        """,
        "event_transitions": """
            WITH s AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS prev_type
              FROM events
            )
            SELECT prev_type AS from_type, event_type AS to_type,
                   count(*)::BIGINT AS n
            FROM s WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        """,
        "doc_length_ntiles": f"""
            SELECT doc_id, n_chars,
                   row_number() OVER w::BIGINT AS rank,
                   ntile({NTILE_K}) OVER w::BIGINT AS ntile
            FROM documents
            WINDOW w AS (ORDER BY n_chars, doc_id)
        """,
        "cdc_late_arrivals": f"""
            WITH w AS (
              SELECT repo, path, updated_ts,
                     max(updated_ts) OVER (
                       PARTITION BY repo, path ORDER BY commit_seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS prev_max
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            )
            SELECT repo, path, count(*)::BIGINT AS n_events,
                   coalesce(sum(CASE WHEN updated_ts < prev_max
                                     THEN 1 ELSE 0 END), 0)::BIGINT AS n_late,
                   coalesce(max(CASE WHEN updated_ts < prev_max
                                     THEN epoch_us(prev_max) - epoch_us(updated_ts)
                                END), 0)::BIGINT AS max_regression_us
            FROM w GROUP BY repo, path
        """,
        "path_lifecycle": f"""
            WITH w AS (
              SELECT repo, path, commit_seq, op,
                     lag(op) OVER (
                       PARTITION BY repo, path ORDER BY commit_seq) AS prev_op
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            )
            SELECT repo, path,
                   sum(CASE WHEN op = 'upsert' THEN 1 ELSE 0 END)::BIGINT
                     AS n_upserts,
                   sum(CASE WHEN op = 'delete' THEN 1 ELSE 0 END)::BIGINT
                     AS n_deletes,
                   sum(CASE WHEN op = 'upsert' AND prev_op = 'delete'
                            THEN 1 ELSE 0 END)::BIGINT AS n_recreates,
                   CASE WHEN arg_max(op, commit_seq) = 'upsert'
                        THEN 1 ELSE 0 END::BIGINT AS live
            FROM w GROUP BY repo, path
        """,
        "repo_churn_concentration": f"""
            WITH c AS (
              SELECT repo, path, count(*)::BIGINT AS n
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              GROUP BY repo, path
            ),
            r AS (
              SELECT repo, n,
                     row_number() OVER (
                       PARTITION BY repo ORDER BY n DESC, path) AS rk,
                     count(*) OVER (PARTITION BY repo) AS n_paths,
                     sum(n) OVER (PARTITION BY repo) AS n_changes
              FROM c
            )
            SELECT repo, max(n_paths)::BIGINT AS n_paths,
                   max(n_changes)::BIGINT AS n_changes,
                   ((max(n_paths) + 9) // 10)::BIGINT AS top_paths,
                   (1000 * sum(CASE WHEN rk <= (n_paths + 9) // 10
                                    THEN n ELSE 0 END) // max(n_changes)
                   )::BIGINT AS top_share_pm
            FROM r GROUP BY repo
        """,
        "repo_freshness": f"""
            WITH m AS (
              SELECT max(epoch_us(event_ts)) AS head
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            )
            SELECT repo, count(*)::BIGINT AS n_events,
                   max(epoch_us(event_ts))::BIGINT AS last_event_us,
                   ((SELECT head FROM m) - max(epoch_us(event_ts)))::BIGINT
                     AS lag_us
            FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            GROUP BY repo
        """,
        "order_exists_join": f"""
            SELECT o_orderpriority, count(*)::BIGINT AS order_count
            FROM orders o
            WHERE EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                      + INTERVAL {EXISTS_LATE_DAYS} DAY
            )
            GROUP BY o_orderpriority
        """,
        "vocab_coverage": f"""
            WITH tok AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
              FROM documents
            ),
            c AS (SELECT token, count(*)::BIGINT AS n FROM tok GROUP BY token),
            r AS (
              SELECT n,
                     row_number() OVER (ORDER BY n DESC, token) AS rk,
                     sum(n) OVER (ORDER BY n DESC, token
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM c
            ),
            tot AS (SELECT sum(n)::BIGINT AS total FROM c),
            p(pct_pm) AS (VALUES {', '.join(f'({v})' for v in VOCAB_COVERAGE_PM)})
            SELECT p.pct_pm::BIGINT AS pct_pm,
                   min(r.rk)::BIGINT AS k_tokens,
                   min(r.cum)::BIGINT AS covered,
                   tot.total AS total
            FROM p, r, tot
            WHERE r.cum * 1000 >= p.pct_pm * tot.total
            GROUP BY p.pct_pm, tot.total
        """,
        "user_interarrival": """
            WITH w AS (
              SELECT user_id,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap
              FROM events
            )
            SELECT user_id, count(*)::BIGINT AS n_events,
                   (count(*) - 1)::BIGINT AS n_gaps,
                   coalesce(sum(gap), 0)::BIGINT AS sum_gap_us,
                   coalesce(max(gap), 0)::BIGINT AS max_gap_us
            FROM w GROUP BY user_id
        """,
        "returned_revenue_topk": f"""
            SELECT c_custkey, c_name, revenue_c100 FROM (
              SELECT c.c_custkey, c.c_name,
                     sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                        )::BIGINT AS revenue_c100
              FROM customer c
              JOIN orders o ON o.o_custkey = c.c_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1997-01-01'
                AND o.o_orderdate < TIMESTAMP '1997-07-01'
              GROUP BY c.c_custkey, c.c_name
            )
            ORDER BY revenue_c100 DESC, c_custkey
            LIMIT {Q10_TOP_K}
        """,
        "lineitem_discount_revenue": f"""
            SELECT coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                                * CAST(round(l_discount * 100) AS BIGINT)),
                            0)::BIGINT AS revenue_c100,
                   count(*)::BIGINT AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND CAST(round(l_discount * 100) AS BIGINT)
                    BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
              AND l_quantity < {Q6_MAX_QTY}
        """,
        "event_trending": f"""
            WITH c AS (
              SELECT event_type,
                     (epoch_us(ts) // {TREND_WINDOW_US}) * {TREND_WINDOW_US}
                       AS window_us,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            )
            SELECT event_type, window_us, n,
                   (CASE WHEN lag(window_us) OVER w = window_us - {TREND_WINDOW_US}
                         THEN lag(n) OVER w ELSE 0 END)::BIGINT AS prev_n,
                   (n - CASE WHEN lag(window_us) OVER w = window_us - {TREND_WINDOW_US}
                             THEN lag(n) OVER w ELSE 0 END)::BIGINT AS delta
            FROM c WINDOW w AS (PARTITION BY event_type ORDER BY window_us)
        """,
        "doc_weighted_sample": f"""
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     ((CAST(doc_id % {SPLIT_HASH_MOD} AS HUGEINT)
                       * {SPLIT_HASH_MULT}) % {SPLIT_HASH_MOD}) % 1000000 AS h
              FROM documents
            )
            WHERE h < n_chars * {WEIGHTED_RATE_NUM}
        """,
        "doc_novelty": """
            WITH t AS (
              SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            g AS (
              SELECT DISTINCT doc_id,
                     toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t WHERE len(toks) >= 3
              )
            ),
            m AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram)
            SELECT g.doc_id, count(*)::BIGINT AS n_grams,
                   sum(CASE WHEN m.first_doc = g.doc_id THEN 1 ELSE 0 END)::BIGINT
                     AS n_novel,
                   (1000 * sum(CASE WHEN m.first_doc = g.doc_id THEN 1 ELSE 0 END)
                    // greatest(count(*), 1))::BIGINT AS novelty_pm
            FROM g JOIN m USING (gram)
            GROUP BY g.doc_id
        """,
        "event_type_affinity": """
            WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*)::BIGINT AS n_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        """,
        "customer_order_dist": """
            WITH c AS (
              SELECT c.c_custkey, count(o.o_custkey)::BIGINT AS c_count
              FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
              GROUP BY c.c_custkey
            )
            SELECT c_count, count(*)::BIGINT AS custdist
            FROM c GROUP BY c_count
        """,
        "part_promo_share": """
            WITH j AS (
              SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev,
                     (p.p_type = 'PROMO') AS is_promo
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
                AND l.l_shipdate < TIMESTAMP '1997-10-01'
            )
            SELECT coalesce(sum(CASE WHEN is_promo THEN rev END), 0)::BIGINT
                     AS promo_rev_c100,
                   coalesce(sum(rev), 0)::BIGINT AS total_rev_c100,
                   (1000 * coalesce(sum(CASE WHEN is_promo THEN rev END), 0)
                    // coalesce(sum(rev), 1))::BIGINT AS promo_share_pm
        FROM j
        """,
        "hop_distinct_users_hll": (
            f"SELECT * FROM read_parquet('{oracle_paths['hop_distinct_users_hll']}')"
        ),
        "doc_chunk_dedup": (
            f"SELECT * FROM read_parquet('{oracle_paths['doc_chunk_dedup']}')"
        ),
        "embedding_quantize": """
            WITH b AS (
              SELECT vec_id,
                     embedding,
                     CAST(list_max(list_transform(embedding, x -> abs(x)))
                          AS DOUBLE) AS m
              FROM embeddings
            ),
            q AS (
              SELECT vec_id, m,
                     CASE WHEN m = 0
                          THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                          ELSE list_transform(embedding,
                                 x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / m)
                                           AS BIGINT))
                     END AS codes
              FROM b
            )
            SELECT vec_id,
                   CAST(floor(m * 1000000.0) AS BIGINT) AS scale_ppm,
                   CAST(list_min(codes) AS BIGINT) AS q_min,
                   CAST(list_max(codes) AS BIGINT) AS q_max,
                   CAST(list_sum(codes) AS BIGINT) AS q_sum
            FROM q
        """,
        "part_revenue_by_nation": f"""
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                      )::BIGINT AS revenue_c10k
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
                       AND p.p_name LIKE '%{Q9_PART_SUBSTR}%'
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1, 2
        """,
        "order_laggard_suppliers": f"""
            WITH pm AS (
              SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
              FROM lineitem GROUP BY 1, 2
            ),
            om AS (
              SELECT l_orderkey, max(ms) AS mx, count(*) AS ns
              FROM pm GROUP BY 1
            ),
            lag AS (
              SELECT pm.l_orderkey, min(pm.l_suppkey) AS skey
              FROM pm JOIN om ON pm.l_orderkey = om.l_orderkey
              WHERE om.ns >= 2 AND pm.ms = om.mx
              GROUP BY pm.l_orderkey HAVING count(*) = 1
            )
            SELECT s.s_suppkey, s.s_name, count(*)::BIGINT AS n_orders
            FROM lag JOIN supplier s ON s.s_suppkey = lag.skey
            GROUP BY 1, 2
            ORDER BY n_orders DESC, s.s_suppkey ASC
            LIMIT {LAGGARD_TOP_K}
        """,
        "top_supplier_revenue": """
            WITH r AS (
              SELECT l_suppkey AS s_suppkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                        )::BIGINT AS revenue_c10k
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1996-04-01'
              GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name, r.revenue_c10k
            FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
            WHERE r.revenue_c10k = (SELECT max(revenue_c10k) FROM r)
        """,
        "supplier_part_counts": """
            WITH ps AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            )
            SELECT p.p_brand AS brand, p.p_type AS ptype,
                   CAST(p.p_size AS BIGINT) AS size,
                   count(DISTINCT ps.l_suppkey)::BIGINT AS supplier_cnt
            FROM part p JOIN ps ON ps.l_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#13'
              AND p.p_type <> 'PROMO'
              AND p.p_size IN (1, 4, 7, 10)
            GROUP BY 1, 2, 3
        """,
        "part_small_qty": """
            WITH l AS (
              SELECT l_partkey,
                     CAST(round(l_quantity) AS BIGINT) AS q,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem
            ),
            a AS (
              SELECT l_partkey, count(*)::BIGINT AS n, sum(q)::BIGINT AS sq
              FROM l GROUP BY l_partkey
            ),
            s AS (
              SELECT coalesce(sum(l.c), 0)::BIGINT AS total_c100,
                     count(l.c)::BIGINT AS n_small
              FROM l
              JOIN part p ON p.p_partkey = l.l_partkey
                         AND p.p_brand = 'Brand#13'
              JOIN a ON a.l_partkey = l.l_partkey
              WHERE 5 * l.q * a.n < a.sq
            )
            SELECT total_c100, n_small,
                   (total_c100 // 7)::BIGINT AS avg_yearly_c100
            FROM s
        """,
        "idle_customer_balance": """
            WITH c AS (
              SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey,
                     CAST(round(c_acctbal * 100) AS BIGINT) AS bal
              FROM customer
            ),
            s AS (
              SELECT coalesce(sum(bal), 0)::BIGINT AS s,
                     count(*)::BIGINT AS n
              FROM c WHERE bal > 0
            )
            SELECT c.nationkey, count(*)::BIGINT AS numcust,
                   sum(c.bal)::BIGINT AS totacctbal_c100
            FROM c, s
            WHERE c.bal * s.n > s.s
              AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2001-01-01'
              )
            GROUP BY c.nationkey
        """,
        "nation_pair_volume": """
            WITH sn AS (
              SELECT s_suppkey, n_name
              FROM supplier JOIN nation ON n_nationkey = s_nationkey
            ),
            cn AS (
              SELECT c_custkey, n_name
              FROM customer JOIN nation ON n_nationkey = c_nationkey
            )
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                      )::BIGINT AS revenue_c10k
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN cn ON cn.c_custkey = o.o_custkey
            JOIN sn ON sn.s_suppkey = l.l_suppkey
            WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
                   OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
        """,
        "disjunctive_part_revenue": """
            WITH j AS (
              SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev,
                     CAST(round(l.l_quantity) AS BIGINT) AS q,
                     p.p_brand AS b, p.p_size AS s
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            )
            SELECT coalesce(sum(rev), 0)::BIGINT AS revenue_c10k,
                   count(rev)::BIGINT AS n_items
            FROM j
            WHERE (b = 'Brand#1' AND s BETWEEN 1 AND 5 AND q BETWEEN 1 AND 11)
               OR (b = 'Brand#2' AND s BETWEEN 1 AND 10 AND q BETWEEN 10 AND 20)
               OR (b = 'Brand#3' AND s BETWEEN 1 AND 15 AND q BETWEEN 20 AND 30)
        """,
        "doc_surprisal": """
            WITH t AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
                       AS token
              FROM documents
            ),
            c AS (SELECT token, count(*)::BIGINT AS n FROM t GROUP BY token),
            s AS (SELECT coalesce(sum(n), 0)::BIGINT AS total FROM c)
            SELECT t.doc_id,
                   count(*)::BIGINT AS n_tokens,
                   sum(length(printf('%b', s.total))
                       - length(printf('%b', c.n)))::BIGINT AS sum_bits,
                   (1000 * sum(length(printf('%b', s.total))
                               - length(printf('%b', c.n)))
                    // greatest(count(*), 1))::BIGINT AS mean_millibits
            FROM t JOIN c USING (token), s
            GROUP BY t.doc_id
        """,
        "part_min_price_supplier": """
            WITH l AS (
              SELECT l_partkey, l_suppkey,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS c
              FROM lineitem
            ),
            p AS (SELECT p_partkey FROM part WHERE p_type = 'LARGE'),
            m AS (
              SELECT l.l_partkey, min(l.c) AS mc
              FROM l JOIN p ON p.p_partkey = l.l_partkey
              GROUP BY l.l_partkey
            )
            SELECT DISTINCT l.l_partkey AS p_partkey,
                   l.l_suppkey AS s_suppkey,
                   m.mc AS min_price_c100
            FROM l JOIN m ON m.l_partkey = l.l_partkey AND l.c = m.mc
        """,
        "customer_rfm": """
            WITH a AS (SELECT max(o_orderdate) AS anchor FROM orders)
            SELECT o.o_custkey AS c_custkey,
                   count(*)::BIGINT AS frequency,
                   sum(CAST(round(o.o_totalprice * 100) AS BIGINT))::BIGINT
                     AS monetary_c100,
                   CAST(date_diff('day', max(o.o_orderdate), a.anchor) AS BIGINT)
                     AS recency_days
            FROM orders o, a
            GROUP BY o.o_custkey, a.anchor
        """,
        "cochange_walk_rank": f"""
            WITH d AS (
              SELECT DISTINCT repo,
                     CAST(commit_seq // {COMMIT_WINDOW_SECONDS} AS BIGINT) AS win,
                     path
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
            ),
            pairs AS (
              SELECT a.repo, a.path AS path_a, b.path AS path_b
              FROM d a JOIN d b
                ON a.repo = b.repo AND a.win = b.win AND a.path < b.path
              GROUP BY a.repo, a.path, b.path
              HAVING count(*) >= {CO_CHANGE_MIN_WINDOWS}
            ),
            edges AS (
              SELECT repo, path_a AS src, path_b AS dst FROM pairs
              UNION ALL
              SELECT repo, path_b AS src, path_a AS dst FROM pairs
            ),
            deg AS (
              SELECT repo, src, count(*)::BIGINT AS d FROM edges GROUP BY 1, 2
            ),
            r1 AS (
              SELECT e.repo, e.dst AS node,
                     sum({WALK_RANK_INIT} // g.d)::BIGINT AS rank
              FROM edges e JOIN deg g ON g.repo = e.repo AND g.src = e.src
              GROUP BY 1, 2
            ),
            r2 AS (
              SELECT e.repo, e.dst AS node, sum(r1.rank // g.d)::BIGINT AS rank
              FROM edges e
              JOIN deg g ON g.repo = e.repo AND g.src = e.src
              JOIN r1 ON r1.repo = e.repo AND r1.node = e.src
              GROUP BY 1, 2
            )
            SELECT repo, node AS path, rank AS rank2 FROM r2
        """,
        "nation_market_share": """
            WITH rn AS (
              SELECT n_nationkey
              FROM nation JOIN region ON r_regionkey = n_regionkey
              WHERE r_name = 'ASIA'
            ),
            tgt AS (
              SELECT n_nationkey AS k FROM nation WHERE n_name = 'NATION_3'
            ),
            o AS (
              SELECT o.o_orderkey, CAST(year(o.o_orderdate) AS BIGINT) AS y
              FROM orders o
              JOIN customer c ON c.c_custkey = o.o_custkey
              WHERE c.c_nationkey IN (SELECT n_nationkey FROM rn)
                AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                AND o.o_orderdate < TIMESTAMP '1998-01-01'
            ),
            l AS (
              SELECT l.l_orderkey,
                     CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev,
                     (s.s_nationkey = (SELECT k FROM tgt)) AS is_t
              FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
            ),
            g AS (
              SELECT o.y AS o_year,
                     coalesce(sum(CASE WHEN l.is_t THEN l.rev END), 0)::BIGINT
                       AS target_rev_c10k,
                     coalesce(sum(l.rev), 0)::BIGINT AS total_rev_c10k
              FROM o JOIN l ON l.l_orderkey = o.o_orderkey
              GROUP BY o.y
            )
            SELECT o_year, target_rev_c10k, total_rev_c10k,
                   (1000 * target_rev_c10k
                    // greatest(total_rev_c10k, 1))::BIGINT AS share_pm
            FROM g
        """,
        "cohort_revenue": """
            WITH o AS (
              SELECT o_custkey,
                     CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                          AS BIGINT) AS m,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS c
              FROM orders
            ),
            f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY o_custkey)
            SELECT f.cohort AS cohort_month, o.m - f.cohort AS age_months,
                   count(*)::BIGINT AS n_orders, sum(o.c)::BIGINT AS revenue_c100
            FROM o JOIN f USING (o_custkey)
            GROUP BY 1, 2
        """,
        "embedding_power_iteration": f"""
            WITH q AS (
              SELECT list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {KMEANS_SCALE})
                                 AS BIGINT)) AS qv
              FROM embeddings
            ),
            u AS (SELECT qv, list_sum(qv)::BIGINT AS u FROM q),
            dims AS (
              SELECT unnest(range(1, (SELECT max(len(qv)) FROM q) + 1)) AS i
            )
            SELECT CAST(d.i - 1 AS BIGINT) AS dim,
                   sum(u.u * CAST(u.qv[d.i] AS BIGINT))::BIGINT AS w
            FROM u CROSS JOIN dims d
            GROUP BY d.i
        """,
        "doc_span_corruption": f"""
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS toks
              FROM documents
            ),
            tok AS (
              SELECT doc_id, unnest(range(1, len(toks) + 1)) - 1 AS idx
              FROM t WHERE len(toks) >= 1
            ),
            m AS (
              SELECT doc_id, idx,
                     (((((CAST(doc_id % {SPLIT_HASH_MOD} AS HUGEINT)) * 1000003
                         + idx) % {SPLIT_HASH_MOD})
                       * {SPLIT_HASH_MULT}) % {SPLIT_HASH_MOD}) % 1000 AS hmod
              FROM tok
            ),
            masked AS (
              SELECT doc_id, idx FROM m WHERE hmod < {SPAN_MASK_PER_MILLE}
            ),
            runs AS (
              SELECT doc_id, idx,
                     idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
                       AS grp
              FROM masked
            )
            SELECT doc_id, min(idx)::BIGINT AS span_start,
                   count(*)::BIGINT AS span_len
            FROM runs GROUP BY doc_id, grp
        """,
        "embedding_truncation_error": f"""
            WITH q AS (
              SELECT vec_id,
                     list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {KMEANS_SCALE})
                                 AS BIGINT)) AS qv
              FROM embeddings
            ),
            e AS (
              SELECT vec_id,
                     CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)
                       AS energy_full,
                     CAST(list_sum(list_transform(
                            list_slice(qv, 1, {MATRYOSHKA_K}), x -> x * x))
                          AS BIGINT) AS energy_head
              FROM q
            )
            SELECT vec_id, energy_full, energy_head,
                   (1000 * energy_head
                    // greatest(energy_full, 1))::BIGINT AS retained_pm
            FROM e
        """,
        "lang_confusion": f"""
            WITH p AS ({_langid_sql()})
            SELECT lang, lang_pred, count(*)::BIGINT AS n_docs
            FROM p GROUP BY 1, 2
        """,
        "order_volume_cumulative": """
            WITH d AS (
              SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
                     count(*)::BIGINT AS n_orders,
                     sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
              FROM orders GROUP BY 1
            )
            SELECT day, n_orders,
                   sum(n_orders) OVER (ORDER BY day)::BIGINT AS cum_orders,
                   sum(c) OVER (ORDER BY day)::BIGINT AS cum_revenue_c100
            FROM d
        """,
        "doc_curation_priority": f"""
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(coalesce(text, '')), '\\w+') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
              FROM (
                SELECT doc_id, toks,
                       unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i
                FROM t
              )
            ),
            rep AS (
              SELECT t.doc_id,
                     coalesce(a.n_grams, 0) AS n_grams,
                     coalesce(a.n_dist, 0) AS n_dist
              FROM t LEFT JOIN (
                SELECT doc_id, count(*)::BIGINT AS n_grams,
                       count(DISTINCT gram)::BIGINT AS n_dist
                FROM g GROUP BY doc_id
              ) a USING (doc_id)
            ),
            base AS (
              SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS m_len,
                     (1000 * (r.n_grams - r.n_dist)
                      // greatest(r.n_grams, 1))::BIGINT AS rep_pm,
                     c.ratio_permille AS comp_pm
              FROM documents d
              JOIN rep r USING (doc_id)
              JOIN read_parquet(
                '{oracle_paths['doc_compression_ratio']}') c USING (doc_id)
            ),
            n AS (SELECT count(*)::BIGINT AS total FROM base)
            SELECT b.doc_id, b.m_len, b.rep_pm, b.comp_pm,
                   (1000 * (rank() OVER (ORDER BY b.m_len) - 1) // n.total
                    + (1000
                       - 1000 * (rank() OVER (ORDER BY b.rep_pm) - 1) // n.total)
                    + 1000 * (rank() OVER (ORDER BY b.comp_pm) - 1) // n.total
                   )::BIGINT AS priority
            FROM base b, n
        """,
        "doc_bottomk_sample": f"""
            WITH h AS (
              SELECT doc_id,
                     ((CAST(doc_id % {SPLIT_HASH_MOD} AS HUGEINT)
                       * {SPLIT_HASH_MULT}) % {SPLIT_HASH_MOD})::BIGINT AS h
              FROM documents
            )
            SELECT doc_id, h FROM h ORDER BY h, doc_id LIMIT {BOTTOMK_K}
        """,
        "token_kmv_distinct": (
            f"SELECT * FROM read_parquet('{oracle_paths['token_kmv_distinct']}')"
        ),
        "user_cm_sketch": (
            f"SELECT * FROM read_parquet('{oracle_paths['user_cm_sketch']}')"
        ),
        "funnel_latency": """
            WITH a AS (
              SELECT user_id, min(epoch_us(ts)) AS ta
              FROM events WHERE event_type = 'signup' GROUP BY user_id
            ),
            b AS (
              SELECT e.user_id, min(epoch_us(e.ts)) AS tb
              FROM events e JOIN a USING (user_id)
              WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= a.ta
              GROUP BY e.user_id
            ),
            lat AS (
              SELECT b.tb - a.ta AS l FROM a JOIN b USING (user_id)
            )
            SELECT count(*)::BIGINT AS n_converted,
                   coalesce(sum(l), 0)::BIGINT AS sum_lat_us,
                   (coalesce(sum(l), 0) // greatest(count(*), 1))::BIGINT
                     AS mean_lat_us,
                   coalesce(min(l), 0)::BIGINT AS min_lat_us,
                   coalesce(max(l), 0)::BIGINT AS max_lat_us
            FROM lat
        """,
        "repo_activity_trend": f"""
            WITH d AS (
              SELECT repo,
                     CAST(epoch_us(event_ts) // 86400000000 AS BIGINT) AS day,
                     count(*)::BIGINT AS n
              FROM read_parquet('{_CDC_EVENTS_QUERY_DIR}/events_*.parquet')
              GROUP BY 1, 2
            ),
            s AS (
              SELECT repo, count(*)::BIGINT AS k, sum(day)::BIGINT AS sx,
                     sum(n)::BIGINT AS sy, sum(day * n)::BIGINT AS sxy,
                     sum(day * day)::BIGINT AS sxx
              FROM d GROUP BY repo
            )
            SELECT repo, k AS n_days,
                   (k * sxy - sx * sy)::BIGINT AS slope_num,
                   (k * sxx - sx * sx)::BIGINT AS slope_den
            FROM s
        """,
        "token_overlap_sketch": (
            f"SELECT * FROM read_parquet('{oracle_paths['token_overlap_sketch']}')"
        ),
        "multimodal_thumbnails": (
            f"SELECT * FROM read_parquet('{oracle_paths['multimodal_thumbnails']}')"
        ),
        "multimodal_real_decode": (
            f"SELECT * FROM read_parquet('{oracle_paths['multimodal_real_decode']}')"
        ),
        "event_trigram_paths": """
            WITH o AS (
              SELECT user_id, event_type,
                     lag(event_type, 1) OVER w AS p1,
                     lag(event_type, 2) OVER w AS p2,
                     lag(user_id, 2) OVER w AS u2
              FROM events
              WINDOW w AS (ORDER BY user_id, ts, event_id)
            ),
            tri AS (
              SELECT p2 AS t1, p1 AS t2, event_type AS t3,
                     count(*)::BIGINT AS n
              FROM o WHERE u2 = user_id
              GROUP BY 1, 2, 3
            )
            SELECT t1, t2, t3, n FROM tri
            ORDER BY n DESC, t1, t2, t3 LIMIT 20
        """,
        "doc_cross_probe": f"""
            SELECT doc_id, status, dup_of
            FROM read_parquet('{oracle_paths['doc_incremental_dedup']}')
            WHERE wave = 2
        """,
    }
