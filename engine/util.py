"""Small shared helpers for the bench harnesses."""

from __future__ import annotations


def median(xs) -> float:
    """True median: midpoint of the two central values for even counts.
    (Round-3 scaling summaries used sorted(xs)[n//2], which reports the
    SLOWER of the two middle runs for even run counts — shared here so
    bench.py and jobs/bench_pipeline.py can't drift.)"""
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2
