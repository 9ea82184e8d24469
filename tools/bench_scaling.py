"""Two-parallelism scaling evidence (BASELINE.json:14; task brief).

No real cluster exists in this sandbox, so the N -> 4N executor rule is
evidenced two complementary ways, each a fresh JVM per configuration on the
same input:

  - ``cores`` mode: local[8] vs local[32] — threads in one executor JVM.
    Measures CPU scaling of the kernel stages but couples all executors to
    one heap/GC and one Python-worker pool.
  - ``cluster`` mode: local-cluster[2,4,m] vs local-cluster[8,4,m] — real
    multi-JVM: N=2 -> 4N=8 SEPARATE executor processes, 4 cores + fixed
    heap EACH, engine shipped via --py-files exactly like spark-submit on a
    cluster. This is the shape the north rule names (N and 4N executors
    with per-executor resources constant).

Efficiency = (thr_4N / thr_N) / 4, reported BOTH whole-job and
parallel-phase-only (run_rollup phase timers split the parallel
compute+write wall from the fixed latency-bound costs: pending-partition
reads, tiny per-tier stats jobs, serial lineage/manifest commits — the
Amdahl term a real cluster pays once per job regardless of size).

Writes BENCH/scaling*.json (one file per --tag). BENCH/BASELINE.md is
HAND-MAINTAINED prose that cites these json files — this script does not
regenerate it (ADVICE r03: the docstring used to claim otherwise); update
the markdown when a re-run changes a headline number.

Usage:
  python tools/bench_scaling.py [--docs 24000 --len 8192 --runs 3]
      [--mode cores|cluster|both] [--skip-compress] [--tag X]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# worker memory for local-cluster executors (mb); 4 cores each
CLUSTER_MEM_MB = 10240
MASTERS = {
    "cores": (("local[8]", 8), ("local[32]", 32)),
    "cluster": (
        (f"local-cluster[2,4,{CLUSTER_MEM_MB}]", 8),
        (f"local-cluster[8,4,{CLUSTER_MEM_MB}]", 32),
    ),
}


def run_config(
    master: str, docs: int, length: int, runs: int, compress: bool, warmup: int = 2
) -> dict:
    cmd = [
        sys.executable,
        str(REPO / "jobs" / "bench_pipeline.py"),
        "--docs", str(docs), "--len", str(length),
        "--master", master, "--runs", str(runs), "--warmup", str(warmup),
    ]
    if not compress:
        cmd.append("--no-compress")
    # 16g driver heap, NOT 48g (round-2 diagnosis, BENCH/BASELINE.md): at
    # 48g the window-stage sorters fill the heap before spilling and G1
    # young pauses reach 2.3 s; at 16g GC is <5% of wall. Executor heaps in
    # cluster mode are fixed per worker by the master string.
    env = dict(os.environ, SPARK_DRIVER_MEMORY="16g")
    print(f"--- {master} compress={compress}: {' '.join(cmd)}", file=sys.stderr, flush=True)
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, check=True, env=env
    ).stdout
    summary = None
    for line in out.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("summary"):
            summary = rec
        print(line, file=sys.stderr, flush=True)
    if summary is None:
        raise RuntimeError(f"no summary line from {master}: {out[-2000:]}")
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=24000)
    ap.add_argument("--len", type=int, default=8192, dest="length")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--mode", default="both", choices=["cores", "cluster", "both"])
    ap.add_argument("--skip-compress", action="store_true")
    ap.add_argument("--variant", default=None, choices=["nocomp", "comp"],
                    help="run only one compression variant")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    git_sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()

    modes = ["cores", "cluster"] if args.mode == "both" else [args.mode]
    results: dict = {}
    variants = (False,) if args.skip_compress else (False, True)
    if args.variant:
        variants = (args.variant == "comp",)
    for mode in modes:
        for compress in variants:
            for master, cores in MASTERS[mode]:
                key = f"{mode}-{'comp' if compress else 'nocomp'}-{cores}"
                results[key] = run_config(
                    master, args.docs, args.length, args.runs, compress,
                    warmup=args.warmup,
                )

    total_tokens = args.docs * args.length

    def eff(mode: str, comp: str) -> dict | None:
        lo = results.get(f"{mode}-{comp}-8")
        hi = results.get(f"{mode}-{comp}-32")
        if not lo or not hi:
            return None
        whole = hi["tokens_per_sec"] / lo["tokens_per_sec"] / 4.0
        par = (
            lo["median_parallel_seconds"] / hi["median_parallel_seconds"] / 4.0
            if hi.get("median_parallel_seconds")
            else None
        )
        return {
            "thr_lo": lo["tokens_per_sec"],
            "thr_hi": hi["tokens_per_sec"],
            "whole_job": round(whole, 3),
            "parallel_phase": round(par, 3) if par else None,
            "fixed_s_lo": lo.get("median_fixed_seconds"),
            "fixed_s_hi": hi.get("median_fixed_seconds"),
            "parallel_s_lo": lo.get("median_parallel_seconds"),
            "parallel_s_hi": hi.get("median_parallel_seconds"),
        }

    effs = {
        f"{mode}-{comp}": e
        for mode in modes
        for comp in (("nocomp",) if args.skip_compress else ("nocomp", "comp"))
        if (e := eff(mode, comp)) is not None
    }

    os.makedirs(REPO / "BENCH", exist_ok=True)
    payload = {
        "input": {"docs": args.docs, "len": args.length, "tokens": total_tokens, "seed": 42},
        "runs_per_config": args.runs,
        "git_sha": git_sha,
        "configs": results,
        "efficiency": effs,
    }
    out_name = f"scaling{('-' + args.tag) if args.tag else ''}.json"
    with open(REPO / "BENCH" / out_name, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(effs, indent=2))


if __name__ == "__main__":
    main()
