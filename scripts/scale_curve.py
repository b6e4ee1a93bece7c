"""100× growth curve for the shuffle-dominant keys (VERDICT r5 #4).

Runs ~15 shuffle-heavy queries at 1× (sf0.1), 10× (/tmp/sfbig) and 100×
(/tmp/sf100x — 60M lineitem / 10M events / 500k docs / 200k vectors,
built by `SFBIG_DIR=/tmp/sf100x SFBIG_REPLICAS=100 python
scripts/make_sfbig.py`) and prints per-key wall seconds plus the
10×→100× growth factor.  This is the closest local[32] gets to
certifying the 100 TB scale claims: a key whose plan is
linear-with-partitions should grow ≤~10× wall for 10× data (usually
much less while fixed cost amortizes); anything super-linear in INPUT
is a plan bug to chase.  Output growth is allowed where output grows
(pair keys) — the numbers are printed next to the output row count so
that distinction is visible.

Method matches bench.py: noop-format write forces full compute with no
driver-collect cost; one discarded warm-up per session.

Replication note: the 100× corpus gives every document 99 EXACT
replicas, so every LSH band bucket for replicated text has width 100 >
the 64 hot-bucket cap — minhash at 100× therefore exercises the
skew-cap path (bounded candidates, sub-quadratic wall), which is
exactly the 100 TB boilerplate story.  Exact dedup still reports the
replica groups.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lstore_spark.registry import QUERIES  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

SCALES = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", os.environ.get("SFBIG_DIR", "/tmp/sfbig")),
    ("100x", os.environ.get("SF100X_DIR", "/tmp/sf100x")),
]

KEYS = [
    # joins / aggs / windows on lineitem+orders (the TPC-H-grain shuffles)
    "q_agg_groupby_hash",
    "q_agg_count_distinct",
    "q_join_inner_hash",
    "q_join_sort_merge",
    "q_join_multiway_star",
    "q_join_asof",
    "q_win_running_sum",
    "q_tpch_q3_shipping",
    # events-grain session/window shuffles
    "q_stream_session_window",
    "q_evt_retention",
    # LLM-pipeline shuffle-heavy
    "q_llm_dedup_exact",
    "q_llm_dedup_minhash",
    "q_llm_dedup_clusters_portable",
    "q_llm_text_tfidf",
    "q_llm_sim_cosine_topk",
    "q_llm_emb_pq_adc",
    # round-6 additions
    "q_join_bloom_prune",
    "q_cdc_snapshot_diff",
    "q_llm_dedup_semantic",
    "q_ts_counter_rate",
    "q_ts_interpolate",
    "q_evt_rfm",
    "q_llm_pipeline_e2e",
    "q_llm_sim_hamming_topk",
    # round-7: the Lee-et-al production shape (w=50, 16-byte span keys)
    "substring_w50_hashed",
    # round-7 additions
    "q_tpch_q5_local_supplier",
    "q_agg_heavy_hitters_cms",
    "q_agg_quantile_sketch",
    # round-7 late additions
    "q_tpch_q7_volume",
    "q_tpch_q8_market_share",
    "q_tpch_q14_promo",
    "q_tpch_q15_top_supplier",
    "q_tpch_q19_brand_bands",
    "q_evt_markov",
    "q_ts_ewma",
    "q_profile_key_skew",
    "q_agg_entropy_mi",
    "q_llm_text_char_entropy",
    "q_llm_sample_importance",
    "q_llm_sim_lsh_topk",
    "q_tpch_q6_forecast",
    "q_tpch_q13_custdist",
    "q_tpch_q17_small_qty",
    "q_tpch_q22_idle_rich",
    "q_mv_incremental_refresh",
    "q_agg_approx_distinct_merge",
    "q_evt_conversion_time",
    "q_graph_rank_2hop",
    "q_win_time_range",
    "q_evt_active_users",
    "q_ts_cusum",
    "q_evt_growth_accounting",
    "q_ts_drawdown",
    "q_evt_basket_lift",
    "q_llm_text_keywords",
    "q_ts_zscore_rolling",
]


def _semantic_adaptive(spark, sf_dir):
    """The production SemDeDup path: k scales with corpus size — the
    registered query's fixed k=8 exists only for the static oracle twin
    and would go quadratic at 200k vectors.  With the IVF-routed
    hierarchical assignment (O(n·√k) cosines), total cost
    n·√k + n²/k is minimized at k = n^(2/3): O(n^(4/3)) overall vs
    O(n^1.5) for brute-force assignment at k=√n (measured 14.9× wall
    for 10× data before this; each further routing level approaches
    O(n log n))."""
    from lstore_spark.catalog import load_table, table_rows
    from lstore_spark.llm.dedup import semantic_dedup
    n = table_rows(sf_dir, "embeddings")
    return semantic_dedup(load_table(spark, sf_dir, "embeddings"),
                          n_clusters=max(8, int(n ** (2.0 / 3.0))),
                          hierarchical=True,
                          max_cluster_width=1024)


def _substring_production(spark, sf_dir):
    """q_llm_dedup_substring's production parameters: 50-token windows
    keyed by 16-byte md5 in the counting shuffle, span text re-derived
    from surviving occurrences (VERDICT r6 #5 — previously prose)."""
    from lstore_spark.catalog import load_table
    from lstore_spark.llm.dedup import substring_dedup
    return substring_dedup(load_table(spark, sf_dir, "documents"),
                           w=50, hashed_keys=True)


# key → callable(spark, sf_dir) overriding QUERIES[key] for this sweep
OVERRIDES = {"q_llm_dedup_semantic": _semantic_adaptive,
             "substring_w50_hashed": _substring_production}

# Keys whose OUTPUT row count scales with input (pair/doc-grain results):
# report rows so output-driven growth is distinguishable from plan bugs.
COUNT_ROWS = {"q_llm_dedup_minhash", "q_llm_dedup_clusters_portable",
              "q_llm_dedup_exact"}


def run_once(spark, key: str, sf_dir: str) -> tuple[float, int | None]:
    t0 = time.perf_counter()
    fn = OVERRIDES[key] if key in OVERRIDES else QUERIES[key]
    df = fn(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    rows = df.count() if key in COUNT_ROWS else None
    return wall, rows


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("lstore-spark-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    run_once(spark, "q_agg_groupby_hash", SCALES[0][1])  # warm-up, discarded
    results: dict[str, dict] = {}
    # CLI patterns may name registry keys outside the curated list —
    # curve any registered key the pattern matches (new-key rounds).
    # With no CLI patterns, only the curated list runs.
    extras = sorted(set(QUERIES) - set(KEYS)) if only else []
    keys = [k for k in list(KEYS) + extras
            if not only or any(s in k for s in only)]
    for key in keys:
        results[key] = {}
        for label, sf_dir in SCALES:
            if not os.path.isdir(sf_dir):
                print(f"-- {label} dir {sf_dir} missing, skipped",
                      file=sys.stderr)
                continue
            wall, rows = run_once(spark, key, sf_dir)
            results[key][label] = {"sec": round(wall, 2), "rows": rows}
            print(f"{key:34s} {label:>5s} {wall:8.2f}s"
                  + (f"  rows={rows}" if rows is not None else ""),
                  file=sys.stderr, flush=True)
    # growth factors
    for key, r in results.items():
        if "10x" in r and "100x" in r and r["10x"]["sec"] > 0:
            r["growth_10_to_100"] = round(r["100x"]["sec"] / r["10x"]["sec"], 2)
    print(json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
