"""Named consumer groups (q_stream_consumer_groups): durable atomic
cursors, at-least-once crash-resume, caught-up-consumer segment pruning,
and the lag relation's recount — the message-queue contract the key's
oracle can't see from one snapshot."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lstore_spark.sources.lstore_log import write_segment
from lstore_spark.streaming import consumers as cg


@pytest.fixture()
def store(tmp_path):
    """A 4-segment store with offsets 0..399, 100 per sealed segment."""
    d = tmp_path / "store"
    d.mkdir()
    for i in range(4):
        write_segment(str(d / f"{i:05d}.seg"),
                      [(o, [o, o * 2], [f"t{o % 3}".encode()])
                       for o in range(i * 100, (i + 1) * 100)])
    return str(d)


def test_commit_is_monotone_and_durable(store):
    cg.ensure_group(store, "g1")
    assert cg.committed_offset(store, "g1") == -1
    cg.commit_offset(store, "g1", 150)
    assert cg.committed_offset(store, "g1") == 150
    with pytest.raises(ValueError):
        cg.commit_offset(store, "g1", 120)  # cursors never move back
    cg.commit_offset(store, "g1", 150)  # idempotent re-commit is fine
    cg.commit_offset(store, "g1", 399)
    assert cg.committed_offset(store, "g1") == 399
    with pytest.raises(ValueError):
        cg.commit_offset(store, "g1", None)  # empty poll must not commit
    with pytest.raises(ValueError):
        cg.ensure_group(store, "../escape")  # names are path components


def test_crashed_commit_leaves_cursor_intact_and_resumes(store, spark):
    """The crash-resume contract: a consumer that dies between poll and
    commit re-receives the batch (at-least-once); a commit torn mid-write
    (stale tmp debris, even unreadable garbage) never corrupts the
    durable cursor; the next commit supersedes cleanly."""
    cg.ensure_group(store, "g2")
    cg.commit_offset(store, "g2", 99)
    cursor = cg._cursor_path(store, "g2")
    # crash debris: a half-written tmp from a dead PID + plain garbage
    with open(cursor + ".tmp999999", "w") as fh:
        fh.write('{"offset": 9')  # torn JSON
    assert cg.committed_offset(store, "g2") == 99  # unaffected
    # a consumer restarting after the crash polls from the COMMITTED
    # cursor — the unacked batch is redelivered
    first = sorted(r.offset for r in
                   cg.poll(spark, store, "g2", max_records=50)
                   .select("offset").collect())
    assert first == list(range(100, 150))
    again = sorted(r.offset for r in
                   cg.poll(spark, store, "g2", max_records=50)
                   .select("offset").collect())
    assert again == first, "uncommitted poll must redeliver"
    cg.commit_offset(store, "g2", first[-1])
    nxt = sorted(r.offset for r in
                 cg.poll(spark, store, "g2", max_records=50)
                 .select("offset").collect())
    assert nxt == list(range(150, 200)), "committed poll must advance"
    # the cursor file itself is valid JSON at all times
    with open(cursor) as fh:
        assert json.load(fh)["offset"] == 149


def test_caught_up_consumer_prunes_sealed_segments(store):
    """A consumer at offset 299 must plan a read of ONE segment file
    (the tail), not four — the whole point of cursors over sealed
    trailer stats."""
    from pyspark.sql.datasource import GreaterThan

    from lstore_spark.sources.lstore_log import LstoreLogPushdownReader

    cg.ensure_group(store, "g3")
    cg.commit_offset(store, "g3", 299)
    r = LstoreLogPushdownReader({"path": store})
    r.pushFilters([GreaterThan(("offset",), cg.committed_offset(store, "g3"))])
    assert len(r.partitions()) == 1, "caught-up poll must touch only the tail"


def test_lag_report_matches_recount(store, spark):
    """lag_records from the shared-scan conditional aggregate must equal
    an independent per-group recount, and groups() must enumerate every
    registered cursor."""
    for g, off in (("a", 399), ("b", 250), ("c", -1)):
        cg.ensure_group(store, g)
        if off >= 0:
            cg.commit_offset(store, g, off)
    assert cg.groups(store) == ["a", "b", "c"]
    assert cg.tail_offset(store) == 399
    rel = {r.grp: r for r in cg.lag_report(spark, store).collect()}
    for g in ("a", "b", "c"):
        c = cg.committed_offset(store, g)
        assert rel[g].committed_offset == c
        assert rel[g].tail_offset == 399
        assert rel[g].lag_offsets == 399 - c
        assert rel[g].lag_records == len([o for o in range(400) if o > c])


def test_assign_segments_round_robin_and_guards(store):
    """Scale-out assignment: lo-ordered round-robin, stable under
    append (existing ranks never move), loud on unsealed segments and
    bad consumer counts."""
    from lstore_spark.sources.lstore_log import write_segment

    a2 = cg.assign_segments(store, 2)
    assert a2 == {"00000.seg": 0, "00001.seg": 1,
                  "00002.seg": 0, "00003.seg": 1}
    # appending a new sealed segment extends the mapping, ranks stable
    write_segment(os.path.join(store, "00004.seg"),
                  [(o, [o], [b"x"]) for o in range(400, 450)])
    a2b = cg.assign_segments(store, 2)
    assert {k: v for k, v in a2b.items() if k != "00004.seg"} == a2
    assert a2b["00004.seg"] == 0
    with pytest.raises(ValueError, match="positive"):
        cg.assign_segments(store, 0)
    # an unsealed (trailer-less) segment must fail loudly
    with open(os.path.join(store, "00005.seg"), "wb") as fh:
        fh.write(b"")
    with pytest.raises(ValueError, match="unsealed"):
        cg.assign_segments(store, 2)
    os.unlink(os.path.join(store, "00005.seg"))


def test_assignment_slices_are_disjoint_and_exhaustive(store, spark):
    """Per-consumer polls restricted to assigned segments must tile the
    store exactly: no record in two consumers' slices, none dropped."""
    from lstore_spark.sources.lstore_log import read_segment_file

    n = 3
    assignment = cg.assign_segments(store, n)
    seen: dict[int, set] = {i: set() for i in range(n)}
    for seg, consumer in assignment.items():
        for off, _ints, _blobs, _key in read_segment_file(
                os.path.join(store, seg)):
            seen[consumer].add(off)
    union = set()
    for i in range(n):
        assert not (union & seen[i]), "overlapping consumer slices"
        union |= seen[i]
    assert union == set(range(400)), "assignment dropped records"


def test_poll_assigned_tiles_store_and_respects_cursor(store, spark):
    """Per-instance polls through the reader's segments option must
    tile the store exactly (disjoint, exhaustive), compose with the
    group cursor, and fail loudly on a stale assignment."""
    cg.ensure_group(store, "ga")
    n = 3
    parts = [sorted(r.offset for r in
                    cg.poll_assigned(spark, store, "ga", i, n)
                    .select("offset").collect())
             for i in range(n)]
    flat = [o for p in parts for o in p]
    assert sorted(flat) == list(range(400)), "instances did not tile"
    assert len(flat) == len(set(flat)), "overlapping instance slices"
    # cursor composes: after committing past segment 0, instance 0
    # (segments 0 and 3 of 4, round-robin over 2... use n=2) shrinks
    cg.commit_offset(store, "ga", 99)
    a0 = sorted(r.offset for r in
                cg.poll_assigned(spark, store, "ga", 0, 2)
                .select("offset").collect())
    assert a0 == list(range(200, 300)), a0  # seg 0 consumed, seg 2 mine
    # more instances than segments: empty relation, not an error
    assert cg.poll_assigned(spark, store, "ga", 9, 10).count() == 0
    # stale assignment (assigned file vanished) fails loudly
    import pytest as _pt

    from lstore_spark.sources.lstore_log import LstoreLogReader
    r = LstoreLogReader({"path": store, "segments": "gone.seg"})
    with _pt.raises(FileNotFoundError, match="gone.seg"):
        r.partitions()


def test_groups_are_independent(store, spark):
    """One group's commit must not move another's cursor — the
    N-consumer property q_stream_follow's single cursor lacked."""
    cg.ensure_group(store, "x")
    cg.ensure_group(store, "y")
    cg.commit_offset(store, "x", 399)
    assert cg.committed_offset(store, "y") == -1
    n_y = cg.poll(spark, store, "y").count()
    assert n_y == 400
    assert cg.poll(spark, store, "x").count() == 0
