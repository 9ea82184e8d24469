"""Codec micro-bench: encode vs decode throughput for the C1/C2/C3
multi-frame kernels (engine/compression.py).

Round-4 evidence for the "vectorized C3 read path" item: the transposed
decoders (*_decompress_many) must land within ~4x of the encoders — this
script measures both sides on a representative 1m-tier corpus (dense
60-point frames, token-valued) and on a short-frame corpus, warm (3 runs,
median of the last 2: the first run pays this host's first-touch page
faults — see BENCH/BASELINE.md host diagnosis — which long-running
executors amortize).

Run:  python tools/bench_codec.py            # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# allocator profile matching engine/session.py (must precede numpy alloc)
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(2 * 1024**3))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(2 * 1024**3))

import numpy as np

from engine.compression import (
    dod_compress_many,
    dod_decompress_many,
    gorilla_compress_many,
    gorilla_decompress_many,
)


def _corpus(nf: int, npts: int, seed: int) -> tuple:
    rng = np.random.default_rng(seed)
    counts = np.full(nf, npts, dtype=np.int64)
    ts = np.tile(np.arange(npts, dtype=np.int64), nf)
    vs = rng.integers(0, 50_000, nf * npts).astype(np.int64)
    return ts, vs, counts


def _time(fn, runs: int = 5) -> float:
    """Median of the last runs-1 (first run pays first-touch faults)."""
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    warm = sorted(times[1:])
    return warm[len(warm) // 2] if len(warm) % 2 else (
        warm[len(warm) // 2 - 1] + warm[len(warm) // 2]
    ) / 2


def bench(nf: int, npts: int) -> dict:
    ts, vs, counts = _corpus(nf, npts, seed=nf)
    total = nf * npts
    ft = dod_compress_many(ts, counts)
    fv = gorilla_compress_many(vs, counts)
    dt, _ = dod_decompress_many(ft)
    dv, _ = gorilla_decompress_many(fv)
    assert (dt == ts).all() and (dv == vs).all()
    r = {
        "enc_dod_s": _time(lambda: dod_compress_many(ts, counts)),
        "enc_gor_s": _time(lambda: gorilla_compress_many(vs, counts)),
        "dec_dod_s": _time(lambda: dod_decompress_many(ft)),
        "dec_gor_s": _time(lambda: gorilla_decompress_many(fv)),
    }
    out = {k.replace("_s", "_mpts"): round(total / v / 1e6, 2) for k, v in r.items()}
    out["frames"] = nf
    out["points_per_frame"] = npts
    out["dec_over_enc_dod"] = round(r["enc_dod_s"] / r["dec_dod_s"], 2)
    out["dec_over_enc_gor"] = round(r["enc_gor_s"] / r["dec_gor_s"], 2)
    return out


def main() -> None:
    print(json.dumps({
        "metric": "codec throughput (Mpoints/sec/core, warm)",
        # sized so the cold first-touch pass (host pathology, amortized in
        # real executors) stays in budget; warm throughput is flat in nf
        "dense_1m_tier": bench(20_000, 60),
        "short_frames": bench(50_000, 8),
    }))


if __name__ == "__main__":
    main()
