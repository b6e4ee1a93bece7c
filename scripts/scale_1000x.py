"""1000× probe: one more decade past scale_curve.py (VERDICT standing
question — "would this partition strategy hold at 1000 executors /
100 TB?").

Runs a curated subset of the scale-curve keys against /tmp/sf1000x
(600M lineitem / 100M events / 5M docs / 2M vectors ≈ 16 GB parquet,
built by `SFBIG_DIR=/tmp/sf1000x SFBIG_REPLICAS=1000 python
scripts/make_sfbig.py`) and prints wall seconds next to the key's 100×
reading, so the 100×→1000× growth factor is measured, not extrapolated.
A key whose plan is linear-with-partitions should grow ≤~10× wall for
10× more data; the interesting failures this decade can surface —
sort/shuffle spill, driver-side collect growth, codebook/index
train-vs-load — are exactly what the curated list covers.

Method matches scale_curve.py: noop-format write forces full compute
with no driver-collect cost; one discarded warm-up per session; the
repo's standard tuned session (32 shuffle partitions + AQE), i.e. NO
per-scale re-tuning — partition sizing must come from AQE, as it would
on a real cluster.

Usage: python scripts/scale_1000x.py [key-substring ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstore_spark.registry import QUERIES, release_pins  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

DIR_1000X = os.environ.get("SF1000X_DIR", "/tmp/sf1000x")

# (key, 100x reference seconds).  Source per key: the batch reading in
# scripts/scale_curve_r9b_full.json, EXCEPT three keys where that batch
# number carried a documented one-time/load cost and the solo reading
# from the BASELINE.md round-9 extended ledger is the honest base:
# q_llm_text_char_entropy 5.55 (solo scale_curve run; batch 8.87 under
# load), q_llm_emb_pq_adc 4.44 (solo steady-state; batch 14.39 paid the
# once-per-fixture codebook train), q_llm_corpus_clean 3.61 (solo
# scale_curve run; key absent from the r9b default set).
KEYS = [
    ("q_agg_groupby_hash", 4.36),
    ("q_agg_count_distinct", 1.40),
    ("q_join_inner_hash", 1.52),
    ("q_join_sort_merge", 5.45),
    ("q_tpch_q3_shipping", 2.06),
    ("q_tpch_q7_volume", 2.78),
    ("q_tpch_q13_custdist", 1.72),
    ("q_tpch_q17_small_qty", 2.41),
    ("q_evt_active_users", 2.28),
    ("q_stream_session_window", 2.59),
    ("q_llm_dedup_exact", 1.02),
    ("q_llm_corpus_clean", 3.61),
    ("q_llm_pipeline_e2e", 3.87),
    ("q_llm_text_tfidf", 6.00),
    ("q_llm_text_char_entropy", 5.55),
    ("q_llm_dedup_minhash", 16.46),
    ("q_llm_emb_pq_adc", 4.44),
    # third wave: the headline keys without 1000× coverage (100× bases
    # from scripts/scale_curve_r9c_fill.json and scale_curve_r9b_full).
    # substring_w50_hashed is deliberately absent: 119 s at 100× with a
    # measured 8.63 growth projects ~17 min at 1000× — the 100× curve
    # already certifies the span-key shuffle shape.
    ("q_scan_full", 0.57),
    ("q_filter_int_range", 0.59),
    ("q_join_broadcast", 8.52),
    ("q_join_multiway_star", 3.95),
    ("q_join_asof", 0.84),
    ("q_win_rank_topn", 8.02),
    ("q_win_running_sum", 1.87),
    ("q_topk_limit", 0.59),
    ("q_stream_sliding_sum", 3.38),
    ("q_llm_text_chunk", 8.42),
    ("q_llm_sim_cosine_topk", 2.68),
    # fourth wave: the riskiest NON-headline shuffle shapes (100× bases
    # from scale_curve_r9b_full / fresh r9c runs).  graph_rank_2hop and
    # sim_lsh_topk stay out: ~26 s at 100× with growth ~6 projects
    # 3–5 min each; their 100× curves already certify the shapes.
    ("q_distinct", 1.08),
    ("q_set_union_distinct", 0.43),
    ("q_agg_cube", 2.03),
    ("q_agg_grouping_sets", 0.86),
    ("q_evt_rfm", 1.06),
    ("q_evt_markov", 1.74),
    ("q_cdc_snapshot_diff", 1.91),
    ("q_mv_incremental_refresh", 2.06),
    ("q_profile_key_skew", 1.36),
    ("q_evt_conversion_time", 1.37),
    ("q_evt_growth_accounting", 1.19),
    ("q_tpch_q5_local_supplier", 3.48),
    ("q_tpch_q22_idle_rich", 1.36),
    ("q_tpch_q15_top_supplier", 1.7),
    ("q_join_bloom_prune", 3.02),
    ("q_llm_sample_importance", 2.49),
    ("q_llm_sim_hamming_topk", 2.5),
    ("q_agg_heavy_hitters_cms", 1.64),
    ("q_agg_quantile_sketch", 0.52),
    # fifth wave: the remaining unprobed TPC-H shapes
    ("q_tpch_q10_returns", 2.96),
    ("q_tpch_q18_large_orders", 8.29),
    ("q_tpch_q14_promo", 1.38),
    ("q_tpch_q19_brand_bands", 0.77),
    ("q_tpch_q6_forecast", 0.31),
    # sixth wave: subquery/merge/window/sessionize families (bases from
    # the r9c scale_curve runs); range_frame base is the bucket-merge
    # twin (the native rangeBetween form measured 116 s at 100×).
    ("q_win_range_frame", 10.84),
    ("q_win_lag_lead", 1.2),
    ("q_win_sliding_avg", 2.14),
    ("q_win_ntile_cume", 1.79),
    ("q_win_first_last", 1.68),
    ("q_win_time_range", 1.79),
    ("q_subq_scalar", 0.3),
    ("q_subq_in", 0.25),
    ("q_subq_correlated", 2.17),
    ("q_merge_upsert", 1.51),
    ("q_merge_scd2", 0.75),
    ("q_evt_sessionize", 2.08),
    ("q_evt_attribution", 1.79),
    ("q_sql_recursive_cte", 3.38),
    ("q_ts_ewma", 1.53),
    ("q_ts_cusum", 2.19),
    ("q_ts_zscore_rolling", 5.75),
    ("q_ts_drawdown", 1.99),
    # seventh wave: LLM text/dedup tail (bases from the r9c runs after
    # the fingerprint rewrite).  fingerprint (31.4 s) and simhash
    # (26.2 s) stay out: both measured linear at 100× (the per-shingle
    # md5 / per-token bit-sum work itself) and project ~300 s each.
    ("q_llm_text_langid", 5.46),
    ("q_llm_text_quality", 7.32),
    ("q_llm_text_pack", 2.63),
    ("q_llm_text_pack_bpe", 3.68),
    ("q_llm_text_split", 0.84),
    ("q_llm_filter_cascade", 7.91),
    ("q_llm_dedup_editdist", 0.45),
    ("q_llm_dedup_jaccard_ngram", 0.64),
    ("q_llm_text_repetition", 27.21),
    # eighth wave: agg tail + embeddings family + text-analysis tail
    # (bases from the r9c wave-8 run).  Deliberately absent, with their
    # 100× certification standing in: q_llm_emb_pq_encode (116.6 s at
    # 100×, growth 5.79 — the exact-decimal oracle-parity exhibit; the
    # production encode is the vectorized index-build path),
    # q_llm_text_perplexity (28.6) and q_llm_text_lm_score (23.0) and
    # q_llm_knn_label (19.5) — growth ≤9 certified at 100×, each
    # projects 2-4 min of certified-linear work at 1000×.
    ("q_agg_global", 13.46),
    ("q_agg_having", 1.52),
    ("q_agg_stats", 0.38),
    ("q_agg_collect", 0.27),
    ("q_agg_percentiles", 0.6),
    ("q_agg_mode", 1.62),
    ("q_agg_rollup", 1.71),
    ("q_agg_approx_distinct", 5.93),
    ("q_agg_approx_distinct_merge", 3.62),
    ("q_agg_linreg_trend", 0.97),
    ("q_evt_ab_test", 2.67),
    ("q_llm_emb_quantize", 1.71),
    ("q_llm_emb_binarize", 1.69),
    ("q_llm_emb_whiten", 1.13),
    ("q_llm_emb_matryoshka", 1.68),
    ("q_llm_emb_norm_stats", 0.94),
    ("q_llm_emb_centroid", 8.74),
    ("q_llm_emb_ivf_assign", 26.85),
    ("q_llm_sim_threshold_pairs", 1.42),
    ("q_llm_text_ngrams", 16.3),
    ("q_llm_text_redact", 10.65),
    ("q_llm_text_length_profile", 0.22),
    ("q_llm_corpus_shard", 2.7),
    ("q_llm_mix_sources", 2.61),
    ("q_llm_sample_stratified", 2.56),
    # ninth (completeness) wave: scan/filter/sort/setop/fn/stream tail
    ("q_scan_from_offset", 0.5),
    ("q_scan_tail_window", 0.44),
    ("q_scan_latest_by_key", 1.31),
    ("q_filter_conjunction", 0.74),
    ("q_filter_disjunction_in", 0.41),
    ("q_filter_like_regex", 0.32),
    ("q_filter_null_handling", 0.29),
    ("q_project_prune", 0.32),
    ("q_sort_multi_key", 0.4),
    ("q_limit_offset", 1.18),
    ("q_set_intersect", 1.92),
    ("q_set_intersect_all", 2.03),
    ("q_set_except", 2.35),
    ("q_set_except_all", 1.4),
    ("q_set_union_all", 0.26),
    ("q_stream_tumbling_count", 1.56),
    ("q_fn_variant", 3.42),
    # tenth wave: the UDF surface (Arrow/pickle batch throughput)
    ("q_udf_scalar_python", 0.44),
    ("q_udf_pandas_scalar", 1.25),
    ("q_udf_grouped_map", 4.5),
    ("q_udaf_pandas_grouped_agg", 4.65),
    ("q_udaf_pandas_window", 1.01),
    ("q_udtf_flatmap", 0.28),
    ("q_udtf_python_native", 0.39),
    # eleventh wave (r10, VERDICT r9 #6): measure the last four keys
    # that previously carried only a certified-linear-at-100×
    # projection, so no key is left "projected".  Expect ~3-5 min each
    # (growth ~9-10 of linear per-token/per-shingle work).  The fifth
    # projection, q_llm_text_contamination, needs no probe: its
    # PRODUCTION fixed-eval shape was measured 3.3/3.3/21.9/33.7 s at
    # 1×/10×/100×/1000× in r9 (scale_curve_r9_1000x.json); only the
    # test fixture's k²-replica-pair OUTPUT growth is unprobed, and
    # that is an artifact of key-shifted replication, not the plan.
    ("q_llm_text_fingerprint", 31.43),
    ("q_llm_dedup_simhash", 26.17),
    ("q_llm_text_perplexity", 28.62),
    ("q_llm_text_lm_score", 22.99),
]


def main() -> None:
    spark = get_spark()
    wanted = sys.argv[1:]
    keys = [(k, b) for k, b in KEYS
            if not wanted or any(w in k for w in wanted)]
    # warm-up: discard one small action so JVM/codegen startup is not
    # billed to the first key
    QUERIES["q_scan_full"](spark, DIR_1000X).write \
        .format("noop").mode("overwrite").save()
    release_pins()
    out = {}
    for key, base100 in keys:
        t0 = time.time()
        QUERIES[key](spark, DIR_1000X).write \
            .format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        release_pins()
        growth = round(sec / base100, 2) if base100 else None
        out[key] = {"1000x_sec": sec, "100x_sec": base100,
                    "growth_100_to_1000": growth}
        print(f"{key:34} 1000x {sec:8.2f}s   (100x {base100:.2f}s, "
              f"growth {growth})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
