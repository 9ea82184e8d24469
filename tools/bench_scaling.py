"""Two-parallelism scaling evidence (BASELINE.json:14; task brief).

No real cluster exists in this sandbox, so the N -> 4N executor rule is
evidenced by running the SAME pipeline on the SAME input at local[8] and
local[32] (cores-only delta, fresh JVM per configuration) and reporting
throughput at both plus efficiency = (thr_32 / thr_8) / 4.

Writes BENCH/BASELINE.md and BENCH/scaling.json.

Usage: python tools/bench_scaling.py [--docs 6000 --len 8192 --runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


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
    # 16g heap, NOT 48g (round-2 diagnosis, BENCH/BASELINE.md): at 48g the
    # window-stage sorters fill the heap before spilling and G1 young pauses
    # reach 2.3 s (live set 16+ GB); at 16g GC is <5% of wall and the run-
    # to-run spread collapses. The residual first-runs drift is JIT warm-up
    # of generated code (10x CPU-seconds on a cold JVM), hence warmup=2
    # FULL-SIZE untimed runs per JVM.
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
    ap.add_argument("--docs", type=int, default=6000)
    ap.add_argument("--len", type=int, default=8192, dest="length")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--skip-compress", action="store_true")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    git_sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()

    results = {}
    variants = (False,) if args.skip_compress else (False, True)
    for compress in variants:
        for master, cores in (("local[8]", 8), ("local[32]", 32)):
            key = f"{'comp' if compress else 'nocomp'}-{cores}"
            results[key] = run_config(
                master, args.docs, args.length, args.runs, compress,
                warmup=args.warmup,
            )

    def eff(compress_key: str) -> tuple[float, float, float]:
        thr8 = results[f"{compress_key}-8"]["tokens_per_sec"]
        thr32 = results[f"{compress_key}-32"]["tokens_per_sec"]
        return thr8, thr32, round(thr32 / thr8 / 4.0, 3)

    n8, n32, ne = eff("nocomp")
    c8, c32, ce = eff("comp") if not args.skip_compress else (0, 0, 0)
    total_tokens = args.docs * args.length

    os.makedirs(REPO / "BENCH", exist_ok=True)
    payload = {
        "input": {"docs": args.docs, "len": args.length, "tokens": total_tokens, "seed": 42},
        "runs_per_config": args.runs,
        "git_sha": git_sha,
        "configs": results,
        "efficiency_nocompress": ne,
        "efficiency_compress": ce,
    }
    out_name = f"scaling{('-' + args.tag) if args.tag else ''}.json"
    with open(REPO / "BENCH" / out_name, "w") as f:
        json.dump(payload, f, indent=2)
    if args.tag:
        print(json.dumps(payload["configs"], indent=2)[:400])
        print(f"eff nocompress: {ne}")
        return

    md = f"""# BENCH/BASELINE.md — measured pipeline throughput + scaling evidence

Input: deterministic synthetic token table, {args.docs} docs x {args.length}
tokens = {total_tokens:,} tokens (seed=42, hash-of-id generation), written
to parquet once (untimed). Timed job: full raw -> 1m -> 1h -> 1d rollup
(gap-fill, rolling stats, detect, cascade, lineage commits) to a fresh
warehouse. {args.runs} timed runs after 2 untimed FULL-SIZE warmups per
JVM; MEDIAN reported (protocol in /root/repo/BASELINE.md). Driver heap 16g
(see variance diagnosis below). git {git_sha}. shuffle partitions = core
count. AQE on.

## Scaling (sandbox proxy for N -> 4N executors; BASELINE.json:14)

| variant | local[8] tok/s | local[32] tok/s | efficiency (thr32/thr8)/4 |
|---|---|---|---|
| pipeline, no compression payloads | {n8:,} | {n32:,} | **{ne}** |
| pipeline + Gorilla/DoD payloads | {c8:,} | {c32:,} | **{ce}** |

Raw per-run data (incl. per-run GC seconds, JVM CPU seconds and hypervisor
steal seconds): BENCH/scaling.json `runs_detail`.

## Variance diagnosis (round 2 — why round-1 numbers swung up to 7x)

Measured with per-run JVM counters (jobs/bench_pipeline.py::_jvm_metrics,
GC logs in /tmp/gc-*.log via tools/diag_gc.py):

1. **48g driver heap was the amplifier.** The window-stage sorters consume
   execution memory before spilling; at 48g the live heap during the 1m
   stage exceeded 16 GB and G1 young pauses reached 2.3 s (plus RPC
   heartbeat timeouts during pauses). At 16g the sorters spill to NVMe
   instead and GC drops under 5% of wall. -> benches pin
   SPARK_DRIVER_MEMORY=16g.
2. **Cold generated code costs ~10x CPU, and one warmup was not enough.**
   Same-input runs burned 3121 -> 585 -> 312 JVM CPU-seconds (measured,
   g1_16g diagnosis) as C2 compiled the codegen'd stages. -> 2 untimed
   FULL-SIZE warmups per JVM before the timed runs.
3. **Intermittent hypervisor steal** (up to ~74 s per run observed) adds
   external noise no config removes. -> 5 timed runs, MEDIAN per the
   BASELINE.md protocol; per-run steal seconds recorded next to every
   number so an outlier is attributable.

Interpretation notes:
- the cores-only delta is the honest sandbox proxy: same code, same input,
  same single NVMe — no network shuffle, so it measures CPU scaling of the
  window/agg/Arrow stages, which is the component the 0.8 target governs.
"""
    with open(REPO / "BENCH" / "BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps(payload["configs"], indent=2)[:500])
    print(f"no-compress eff: {ne}  compress eff: {ce}")


if __name__ == "__main__":
    main()
