"""N-commit lineage bench: per-commit conflict-read cost (VERDICT r4 #1).

Measures the number of manifest FILES physically opened by each commit's
conflict read, three ways:

- cold      cache cleared before every commit — the round-3/4 behavior,
            O(total committed manifests) per commit, O(N^2) over the job
- cached    immutable-manifest cache on (the default) — each commit opens
            only manifests that appeared since its last read: O(new) = 1
- compacted cache cleared AND the store compacted every `compact_every`
            commits — the fresh-process bound: summary + tail, never the
            full history

Prints one JSON line with the per-commit open counts and totals.

Usage: python tools/bench_lineage_commits.py [N] [compact_every]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2garmin_spark.pipeline import lineage as L   # noqa: E402
from osm2garmin_spark.session import get_spark       # noqa: E402


def run_mode(spark, root, n, clear_cache, compact_every=0):
    store = L.LineageStore(root)

    def stats_df(t):
        return spark.createDataFrame(
            [(t, 1, t)], "tile_id int, n_rows long, digest long")

    opens = []
    for t in range(n):
        if clear_cache:
            L._MANIFEST_TILE_CACHE.clear()
        before = L.manifest_read_count()
        store.commit(spark, "assign", "bench", stats_df(t),
                     attempt=f"a{t}", detect_conflicts=True)
        opens.append(L.manifest_read_count() - before)
        if compact_every and (t + 1) % compact_every == 0:
            store.compact()
    return opens


def main():
    import tempfile

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    compact_every = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("bench-lineage-commits")

    out = {"metric": "lineage_commit_conflict_reads", "n_commits": n,
           "compact_every": compact_every, "unit": "manifest file opens"}
    with tempfile.TemporaryDirectory() as td:
        cold = run_mode(spark, f"{td}/cold", n, clear_cache=True)
        cached = run_mode(spark, f"{td}/cached", n, clear_cache=False)
        comp = run_mode(spark, f"{td}/comp", n, clear_cache=True,
                        compact_every=compact_every)
    for name, opens in (("cold", cold), ("cached", cached),
                        ("compacted_cold", comp)):
        out[name] = {"total": sum(opens), "max_per_commit": max(opens),
                     "last_commit": opens[-1]}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
