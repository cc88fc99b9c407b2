"""Two-parallelism scaling evidence (north_rule: ≥0.8 efficiency N→4N).

No real cluster in this sandbox, so the same tiling job runs at local[8]
(N) and local[32] (4N) in separate JVMs (subprocesses) over the identical
deterministic corpus; reports rows-joined+tiled/sec at each level and
efficiency = throughput(4N) / (4 × throughput(N)), appended to BENCH.md.

Usage: python tools/bench_scaling.py [--rows 4000000] [--n 8] [--xn 32]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _one(cores: int, rows: int) -> dict:
    # BENCH_REPEATS=1: the child's inner best-of-2 is redundant here —
    # run_pair already interleaves best-of-N at THIS level — and at
    # >=10M rows the doubled low-core leg (plus 2-core corpus
    # generation) blows the subprocess timeout
    env = dict(os.environ, BENCH_CORPUS_ROWS=str(rows), BENCH_REPEATS="1",
               SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                 "/root/testdata/sf0.1"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cores", str(cores),
         "--only", "tiling_verified", "--corpus-rows", str(rows)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(f"[bench_scaling] run cores={cores} produced no JSON; "
                         f"stderr tail:\n{out.stderr[-2000:]}\n")
        return None
    return json.loads(lines[-1])


def run_pair(n: int, xn: int, rows: int, repeats: int = 3):
    """Alternating best-of-N per level: this sandbox shares CPUs with noisy
    neighbors (load average >9 observed with none of our processes running),
    so interleave the levels and keep each level's best run."""
    best = {n: None, xn: None}
    for _ in range(repeats):
        for cores in (xn, n):
            res = _one(cores, rows)
            if res is None:
                continue
            t = res["queries"]["tiling_verified"]
            if best[cores] is None or t < best[cores]["queries"]["tiling_verified"]:
                best[cores] = res
    if best[n] is None or best[xn] is None:
        raise RuntimeError("no successful run for one level; see stderr")
    return best[n], best[xn]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6_000_000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--xn", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    lo, hi = run_pair(args.n, args.xn, args.rows, args.repeats)
    t_lo = lo["queries"]["tiling_verified"]
    t_hi = hi["queries"]["tiling_verified"]
    thr_lo = lo["tile_assignments"] / t_lo
    thr_hi = hi["tile_assignments"] / t_hi
    eff = thr_hi / ((args.xn / args.n) * thr_lo)

    result = {
        "corpus_rows": args.rows,
        "assignments": lo["tile_assignments"],
        "n_tiles": lo["n_tiles"],
        f"local[{args.n}]_sec": t_lo,
        f"local[{args.xn}]_sec": t_hi,
        f"throughput_{args.n}_rows_per_sec": round(thr_lo, 1),
        f"throughput_{args.xn}_rows_per_sec": round(thr_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "target": ">= 0.8",
    }
    for level, res in ((args.n, lo), (args.xn, hi)):
        if "phase_plan_sec" in res:
            result[f"phase_plan_{level}_sec"] = res["phase_plan_sec"]
            result[f"phase_verify_{level}_sec"] = res["phase_verify_sec"]
    print(json.dumps(result, indent=2))

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(f"\n## Scaling run {stamp}\n\n")
        f.write(f"Same tiling job (synth corpus {args.rows:,} rows → density "
                f"scan → quadtree → broadcast assignment join → per-tile "
                f"decode verification, PSNR + caption) at two parallelism "
                f"levels, separate JVMs, best of 3 interleaved runs per "
                f"level (shared-CPU sandbox):\n\n")
        f.write("| parallelism | wall sec | rows joined+tiled+verified/sec |\n|---|---|---|\n")
        f.write(f"| local[{args.n}] (N) | {t_lo} | {thr_lo:,.0f} |\n")
        f.write(f"| local[{args.xn}] (4N) | {t_hi} | {thr_hi:,.0f} |\n\n")
        f.write(f"**Scaling efficiency = {thr_hi:,.0f} / (4 × {thr_lo:,.0f}) "
                f"= {eff:.3f}** (target ≥ 0.8)\n")
        if "phase_plan_sec" in lo and "phase_plan_sec" in hi:
            f.write(f"\nPhase split (plan = density scan + quadtree, the "
                    f"job's only serial component; verify = assignment join "
                    f"+ per-row decode): local[{args.n}] "
                    f"{lo['phase_plan_sec']}s + {lo['phase_verify_sec']}s, "
                    f"local[{args.xn}] {hi['phase_plan_sec']}s + "
                    f"{hi['phase_verify_sec']}s.\n")


if __name__ == "__main__":
    main()
