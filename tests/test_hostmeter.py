"""engine/hostmeter: the self-adjudication counters must be monotone and
the microprobes finite and positive (no Spark needed)."""

from __future__ import annotations

import time

from engine import hostmeter


def test_counters_monotone_and_delta():
    a = hostmeter.snapshot()
    time.sleep(0.05)
    b = hostmeter.snapshot()
    d = hostmeter.delta(a, b)
    assert set(d) == {"steal_s", "busy_cpu_s"}
    assert d["steal_s"] >= 0.0 and d["busy_cpu_s"] >= 0.0


def test_probes_positive_and_fast():
    bw = hostmeter.mem_bandwidth_probe(mb=32, seconds=0.1)
    fl = hostmeter.cpu_probe(seconds=0.05)
    assert 0.05 < bw < 1000.0  # GB/s, sane range
    assert 10.0 < fl < 1e6  # Mflop/s, sane range


def test_host_probe_shape():
    h = hostmeter.host_probe()
    assert set(h) == {"mem_bw_gbps", "cpu_mflops", "loadavg_1m", "loadavg_5m"}
    assert all(v >= 0 for v in h.values())
