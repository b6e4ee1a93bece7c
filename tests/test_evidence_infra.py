"""Pins for the evidence/sweep infrastructure (review r13): the code
that decides which keys the driver re-checks first and how EVIDENCE.md
grades past runs.  A silent bug here weakens the correctness gate
without failing any query, so the semantics are pinned like operator
semantics."""

from __future__ import annotations

import json
import os


def _write(d, name, payload):
    with open(os.path.join(d, name), "w") as fh:
        json.dump(payload, fh)


def test_correctness_files_orders_by_parsed_round(tmp_path):
    """r100 sorts lexicographically BEFORE r99; the shared locator must
    order by the parsed round so latest-round-wins stays correct past
    round 99 (review r13: registry had the fix, evidence.py did not —
    one locator now)."""
    from lstore_spark.registry import correctness_files

    d = str(tmp_path)
    for rnd in (99, 100, 9, 12):
        _write(d, f"CORRECTNESS_r{rnd:02d}.json", {})
    assert [r for r, _ in correctness_files(d)] == [9, 12, 99, 100]


def test_crashed_driver_entry_reads_as_checked_not_green(tmp_path):
    """A crashed driver run (err = traceback, rows_match null) must
    grade as checked-and-NOT-green — tier-0 regression priority in the
    sweep — never as rows-only evidence (review r13: the old routing
    erased the key's checked status, so a crashed key queued behind
    ~30 never-checked keys and could miss the next sweep)."""
    from lstore_spark.registry import _driver_evidence

    d = str(tmp_path)
    entry = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 5, "oracle_rows": 5, "err": None}
    _write(d, "CORRECTNESS_r01.json", {"k_green": entry,
                                       "k_crash": entry,
                                       "k_rowsonly": {**entry,
                                                      "rows_match": None,
                                                      "hash_match": None,
                                                      "err": "no_oracle"}})
    _write(d, "CORRECTNESS_r02.json", {
        "k_crash": {"rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None,
                    "err": "Traceback: boom"}})
    green, checked, latest_round, rows_seen = _driver_evidence(d)
    assert "k_green" in green
    assert "k_crash" in checked and "k_crash" not in green, \
        "crashed run must keep the key in the checked-not-green tier"
    assert "k_crash" not in rows_seen
    assert latest_round["k_crash"] == 2
    assert "k_rowsonly" in rows_seen and "k_rowsonly" not in checked


def test_evidence_md_grades_crash_as_err(tmp_path, monkeypatch):
    """scripts/evidence.py and registry must agree on the crashed-entry
    shape: evidence grades it ERR (r12 pin), registry tiers it
    checked-not-green (r13 pin)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import scripts.evidence as ev

    d = str(tmp_path)
    _write(d, "CORRECTNESS_r99.json", {"k": {
        "rows_match": True, "hash_match": True, "spark_rows": 1,
        "err": None}})
    _write(d, "CORRECTNESS_r100.json", {"k": {
        "rows_match": None, "hash_match": None, "spark_rows": None,
        "err": "Traceback: boom"}})
    monkeypatch.setattr(ev, "ROOT", d)
    got = ev.driver_evidence()
    # latest (r100) wins despite sorting before r99 lexicographically
    assert got["k"] == {"round": 100, "grade": "ERR"}


def test_get_spark_honors_live_session_width(spark):
    """review r13: a default-args get_spark() against a pre-existing
    session must NOT rewrite the live session's deliberate shuffle
    width to the default (the clobber class tune() fixed in r11)."""
    from lstore_spark.session import get_spark

    key = "spark.sql.shuffle.partitions"
    deliberate = "7"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, deliberate)
        got = get_spark()  # default args, session pre-exists
        assert got.conf.get(key) == deliberate, \
            "default get_spark() clobbered the live session's width"
        # an EXPLICIT width is still honored
        got2 = get_spark(shuffle_partitions=11)
        assert got2.conf.get(key) == "11"
    finally:
        spark.conf.set(key, old)
