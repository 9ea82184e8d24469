"""Host-state metering: make benchmark numbers self-adjudicating.

Round-4 lesson: the per-round headline bench "regressed" 1.7x on paper
purely from host drift (hypervisor steal + a ~2 GB/s machine-wide memory
bandwidth ceiling that varies run to run), and adjudicating that required
a manual same-host re-run of code-untouched queries. These counters and
microprobes ride along with every bench so the next cross-round comparison
carries its own evidence:

- cumulative counters (``host_steal``, ``host_busy_cpu``, ``jvm_metrics``)
  are sampled before/after each timed run; the DELTAS say where the wall
  time went (our CPU? someone else's? GC?),
- the two microprobes measure the HOST rather than the engine — a fixed
  numpy memcpy (memory-bandwidth-bound) and a fixed cache-resident
  arithmetic loop (CPU-bound). Same code every round, so round-over-round
  probe drift is host drift by construction, separating "the machine got
  slower" from "the code got slower" without re-running old code.
"""

from __future__ import annotations

import os
import time

import numpy as np


def jvm_metrics(spark) -> dict:
    """Driver-JVM counters: cumulative GC milliseconds and process CPU
    seconds (utime+stime from /proc — in local mode executors are threads
    of the same process, so this covers them too)."""
    jvm = spark._jvm
    gc_ms = 0
    for bean in (
        jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    ):
        gc_ms += bean.getCollectionTime()
    jvm_pid = int(jvm.java.lang.ProcessHandle.current().pid())
    with open(f"/proc/{jvm_pid}/stat") as f:
        parts = f.read().split()
    tick = os.sysconf("SC_CLK_TCK")
    cpu_s = (int(parts[13]) + int(parts[14])) / tick
    return {"gc_ms": gc_ms, "jvm_cpu_s": cpu_s}


def host_steal() -> float:
    """Cumulative hypervisor steal seconds from /proc/stat (field 8)."""
    with open("/proc/stat") as f:
        first = f.readline().split()
    tick = os.sysconf("SC_CLK_TCK")
    return int(first[8]) / tick if len(first) > 8 else 0.0


def host_busy_cpu() -> float:
    """System-wide busy CPU seconds (user+nice+sys) from /proc/stat —
    covers the Python workers the driver-JVM counter misses. Valid as a
    per-run delta only while the box runs nothing else (bench protocol)."""
    with open("/proc/stat") as f:
        p = f.readline().split()
    tick = os.sysconf("SC_CLK_TCK")
    return (int(p[1]) + int(p[2]) + int(p[3])) / tick


def snapshot(spark=None) -> dict:
    """One sample of every cumulative counter (diff two with ``delta``)."""
    d = {"steal_s": host_steal(), "busy_cpu_s": host_busy_cpu()}
    if spark is not None:
        m = jvm_metrics(spark)
        d["gc_s"] = m["gc_ms"] / 1000.0
        d["jvm_cpu_s"] = m["jvm_cpu_s"]
    return d


def delta(before: dict, after: dict) -> dict:
    return {k: round(after[k] - before[k], 3) for k in before}


def mem_bandwidth_probe(mb: int = 256, seconds: float = 1.0) -> float:
    """GB/s of a plain numpy memcpy over a ``mb``-MiB buffer (bytes COPIED
    per second; actual bus traffic is ~2x that, read+write). Far beyond
    cache, so it tracks the sandbox's machine-wide bandwidth ceiling — the
    dominant drift mechanism observed across rounds."""
    # src must be WRITTEN, not just allocated: an all-zeros allocation maps
    # every page to the shared copy-on-write zero page, so the "read"
    # stream comes from cache and the probe reports ~2x the real ceiling
    # (measured 22 vs 11.4 GB/s on this host) — blinding it to exactly the
    # read-bandwidth drift it exists to catch
    src = np.ones(mb * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault dst in before timing
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    dt = time.perf_counter() - t0
    return round(n * src.nbytes / dt / 1e9, 3)


def cpu_probe(seconds: float = 0.5) -> float:
    """Mflop/s of a fixed multiply-add loop over a 512 KiB cache-resident
    array — CPU-speed drift control deliberately independent of memory
    bandwidth (the two probes together separate steal/clock drift from
    bandwidth contention)."""
    x = np.linspace(0.0, 1.0, 65536)
    acc = 0.0
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        acc += float((x * 1.0000001 + 0.5).sum())
        n += 1
    dt = time.perf_counter() - t0
    assert acc == acc  # keep the loop un-elidable
    return round(n * x.size * 2 / dt / 1e6, 1)


def host_probe() -> dict:
    """The full microprobe set + load average, ~1.5 s total."""
    la1, la5, _ = os.getloadavg()
    return {
        "mem_bw_gbps": mem_bandwidth_probe(),
        "cpu_mflops": cpu_probe(),
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
    }
