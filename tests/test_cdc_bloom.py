"""Round-6 additions: Bloom runtime-filter join pruning and CDC
snapshot-diff extraction.  The oracle parity suite certifies values;
these tests certify the *plan shape* (the 100 TB contract) and the
semantic properties the oracle cannot express (no-false-negatives for
the Bloom bitmap; change-feed apply reconstructs the target snapshot).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lstore_spark.catalog import load_table
from lstore_spark.operators.joins import bloom_bitmap, bloom_prune
from lstore_spark.registry import QUERIES


def test_bloom_prune_plan_keeps_smj_filter_below_join(spark, sf_dir):
    """The point of the operator: the exact join stays a sort-merge
    join (the large-large shape the bench hint pins), and the Bloom
    membership filter — identifiable by its seeded xxhash64 calls —
    runs on the probe side, not after the join."""
    df = QUERIES["q_join_bloom_prune"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in p
    assert "xxhash64" in p
    assert "CartesianProduct" not in p
    # the membership test must sit BELOW the SMJ: the first xxhash64
    # occurrence (reading top-down) is inside the probe-side filter
    # under the join, so it appears after the SMJ node header.
    assert p.index("SortMergeJoin") < p.index("xxhash64")


def test_bloom_no_false_negatives(spark, sf_dir):
    """Bloom guarantee: every true-joining probe row survives pruning.
    Exercised on a DIFFERENT build predicate than the registered query
    so the helper itself (not one lucky bitmap) is what's certified."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    od = (load_table(spark, sf_dir, "orders")
          .filter(F.col("o_orderkey") % 17 == 3)
          .select("o_orderkey"))
    bm = bloom_bitmap(od, "o_orderkey").localCheckpoint()
    kept = bloom_prune(li, "l_orderkey", bm)
    true_match = li.join(od, li.l_orderkey == od.o_orderkey, "left_semi")
    # true matches dropped by the bloom filter must be zero
    missed = true_match.exceptAll(kept).count()
    assert missed == 0
    # and pruning must actually prune (bitmap ≫ keys here, so the
    # false-positive rate is essentially zero at this scale)
    assert kept.count() < li.count()


def test_cdc_feed_applied_to_old_reconstructs_new(spark, sf_dir):
    """The change feed is *sufficient*: old snapshot + feed ⇒ new
    snapshot, exactly (insert adds the key, delete removes it, update
    replaces the price; untouched keys pass through).  This is the
    property that makes the diff a usable CDC stream, and it is not
    expressible as a single oracle query."""
    od = load_table(spark, sf_dir, "orders")
    old = (od.filter(F.col("o_orderkey") % 89 != 0)
           .select("o_orderkey", "o_totalprice", "o_orderstatus"))
    new = (od.filter(F.col("o_orderkey") % 97 != 0)
           .select("o_orderkey",
                   F.when(F.col("o_orderstatus") == "O",
                          F.col("o_totalprice") + 5.0)
                   .otherwise(F.col("o_totalprice")).alias("o_totalprice")))
    feed = QUERIES["q_cdc_snapshot_diff"](spark, sf_dir).localCheckpoint()

    applied = (
        old.join(feed, "o_orderkey", "full_outer")
        .filter(F.coalesce(F.col("change_op"), F.lit("")) != "delete")
        .select("o_orderkey",
                F.coalesce(F.col("new_price"), F.col("o_totalprice"))
                .alias("o_totalprice"))
    )
    diff = (applied.exceptAll(new.select("o_orderkey", "o_totalprice")).count()
            + new.select("o_orderkey", "o_totalprice").exceptAll(applied).count())
    assert diff == 0

    ops = {r["change_op"] for r in feed.select("change_op").distinct().collect()}
    assert ops <= {"insert", "update", "delete"} and "update" in ops


def test_hierarchical_assignment_is_pure_projection(spark, sf_dir):
    """assign_nearest_hierarchical's 100 TB contract, tightened r9: the
    corpus is never shuffled OR joined at all — routing is an
    Arrow-batched projection over the scan (the quantizer rides in the
    UDF closure), so the plan contains no join node and no exchange."""
    from pyspark.sql import functions as F2
    from pyspark.sql import Window
    from lstore_spark.llm.embeddings import assign_nearest_hierarchical

    em = load_table(spark, sf_dir, "embeddings")
    w = Window.orderBy("vec_id")
    cvecs = (em.orderBy("vec_id").limit(63)
             .select((F2.row_number().over(w) - 1).alias("ck"),
                     F2.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
                     .alias("cvec")).localCheckpoint())
    df = assign_nearest_hierarchical(em, cvecs, "ck", 63)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p
    assert "CartesianProduct" not in p
    assert "Exchange" not in p


def test_cms_prune_is_superset_and_prunes(spark, sf_dir):
    """The CMS candidate set must contain EVERY true heavy hitter (CMS
    only overestimates — a miss would be silent row loss) while pruning
    most of the key space (the point of the sketch).  Also pins the
    128 KiB sketch shape: flat dense array of d·W longs."""
    from pyspark.sql import functions as F

    from lstore_spark.catalog import load_table
    from lstore_spark.operators.aggregates import (_CMS_SEEDS, _CMS_W,
                                                   cms_estimate, cms_sketch)

    ev = load_table(spark, sf_dir, "events").select("user_id")
    sk = cms_sketch(ev, "user_id")
    row = sk.first()
    assert len(row.cms) == len(_CMS_SEEDS) * _CMS_W
    true = {r.user_id: r.n for r in
            ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {r.user_id: r.est for r in
           (ev.distinct().crossJoin(F.broadcast(sk))
            .select("user_id", cms_estimate("user_id").alias("est"))
            .collect())}
    # superset property: estimate >= true count for EVERY key
    assert all(est[u] >= n for u, n in true.items())
    # with W >> distinct keys the estimates should be near-exact,
    # so a threshold prune keeps ~the true heavy set, not everything
    thr = 1.15 * sum(true.values()) / len(true)
    n_cand = sum(1 for u in true if est[u] >= thr)
    n_true = sum(1 for n in true.values() if n >= thr)
    assert n_true <= n_cand <= max(2 * n_true, n_true + 5)
