"""Peak-memory probe for the streamed read_segment_file (review r13).

The old reader slurped the whole segment (``f.read()``) so a scan
task's peak Python memory was O(segment); the rewrite parses through
an 8 MiB window.  This probe builds a segment ~50x the window, reads
it back record-by-record under tracemalloc, and asserts the traced
peak stays within a few windows — the property that keeps N concurrent
multi-GB-segment scan tasks from OOMing a worker at the 100 TB store
shapes.

Usage: python scripts/segread_mem_probe.py  → one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import tracemalloc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from lstore_spark.sources.lstore_log import (_READ_CHUNK,  # noqa: E402
                                             read_segment_file,
                                             write_segment)


def main() -> None:
    n_rows = 400_000
    blob = b"x" * 1000  # ~1 KB payload per record → ~400 MB segment
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "big.seg")
        write_segment(
            path, ((i, [i, i * 2, i * 3], [b"k%d" % (i % 5), blob])
                   for i in range(n_rows)))
        seg_bytes = os.path.getsize(path)

        tracemalloc.start()
        total = 0
        for off, _ints, _blobs, _key in read_segment_file(path):
            total += 1
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()

    assert total == n_rows, (total, n_rows)
    # refill's transient concat holds old-window + remainder + new
    # chunk at once (~3 windows), plus per-record slack; the old slurp
    # peaked at >= seg_bytes (12x this bound at the probe's sizes)
    bound = 4 * _READ_CHUNK
    out = {
        "probe": "segread_mem",
        "segment_mb": round(seg_bytes / 1e6, 1),
        "rows": total,
        "window_mb": round(_READ_CHUNK / 1e6, 1),
        "traced_peak_mb": round(peak / 1e6, 1),
        "bound_mb": round(bound / 1e6, 1),
        "ok": peak < bound,
    }
    print(json.dumps(out))
    if not out["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
