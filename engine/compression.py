"""C1-C3: delta-of-delta timestamp + Gorilla XOR value compression
(SURVEY.md §2.5; BASELINE.json:6 "delta-of-delta timestamp and Gorilla XOR
value compression inside vectorized Arrow UDFs").

Scheme follows the public Gorilla design (Pelkonen et al., "Gorilla: A
Fast, Scalable, In-Memory Time Series Database", VLDB 2015), adapted to
positional token streams:

  - One frame compresses the NON-NULL (t, v) points of one (doc_id, bucket)
    group, t ascending. Nulls are simply absent points — the t delta stream
    encodes the gap, so no presence bitmap is needed.
  - ts_dod frame:  u32 n | t0 as 64 bits | per point: dod = d_i - d_{i-1}
    (d_0 := 0) encoded with the paper's bucket prefixes
        '0'                      dod == 0
        '10'   + 7  bits         dod in [-63, 64]       (stored dod+63)
        '110'  + 9  bits         dod in [-255, 256]     (stored dod+255)
        '1110' + 12 bits         dod in [-2047, 2048]   (stored dod+2047)
        '1111' + 64 bits         otherwise (two's complement)
    Gap-filled series have d == 1 everywhere, so after the first two points
    every timestamp costs 1 bit.
  - v_gorilla frame: u32 n | v0 as 64 bits | per point: x = u64(v) XOR
    u64(prev):
        '0'                      x == 0
        '10' + meaningful bits   x fits the previous window (see below)
        '11' + 6 bits leading + 6 bits (length-1) + meaningful bits
    (6-bit fields, not the paper's 5/6: our values are 64-bit lanes.)
    Window rule (round-3 DELIBERATE variant of the paper): the reuse
    window is the ACTUAL (leading, trailing) zero count of the PREVIOUS
    NON-ZERO XOR — not the last '11' control block. The paper's rule
    makes the control state a sequential fold over branch decisions; this
    rule is a pure function of the xor sequence itself, so the whole
    encoder vectorizes (prefix-scan for "previous non-zero xor", then
    elementwise branch selection). The decoder recomputes the same window
    from each decoded xor. Compression is within a control bit of the
    paper's on our integer streams; the format is engine-internal (both
    ends below, plus engine/oracle.py, share it).

This module is THE single implementation: engine/oracle.py and the Spark
kernels both call compress/decompress below, so the roundtrip property
(decompress(compress(x)) == x, §5.3) is tested once and holds everywhere.
Two encoder shapes exist per codec and are byte-identical (pinned by
tests/test_compression.py):
  - ``*_compress(frame)``: readable sequential reference for ONE frame;
  - ``*_compress_many(flat, counts)``: the hot path — one flat array
    holding MANY frames, all arithmetic and the bit-packing fully
    vectorized (entry streams + reduceat scatter-OR into u64 words); the
    only Python-level iteration is one slice per produced frame. This is
    what "compression inside vectorized Arrow UDFs" (BASELINE.json:6)
    demands at 10^12-sequence scale: per-POINT Python is gone.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, bit_offset: int = 0) -> None:
        self.data = data
        self.pos = bit_offset

    def read(self, nbits: int) -> int:
        out = 0
        pos = self.pos
        remaining = nbits
        while remaining:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, remaining)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            remaining -= take
        self.pos = pos
        return out


def _to_signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


# ---------------------------------------------------------------------------
# C1: delta-of-delta timestamps
# ---------------------------------------------------------------------------

_DOD_BUCKETS = ((64, 63, 7, 0b10, 2), (256, 255, 9, 0b110, 3), (2048, 2047, 12, 0b1110, 4))


def dod_compress(ts: np.ndarray) -> bytes:
    """C1 kernel: int64 timestamps (ascending) -> frame bytes."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.bytes()
    deltas = np.diff(ts)
    dods = np.empty(n - 1, dtype=np.int64)
    dods[0] = deltas[0]  # d_0 := 0
    dods[1:] = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
            continue
        for hi, off, nbits, prefix, plen in _DOD_BUCKETS:
            if -hi + 1 <= dod <= hi:
                w.write(prefix, plen)
                w.write(dod + off, nbits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    return w.bytes()


def dod_decompress(frame: bytes) -> np.ndarray:
    """C3 inverse of dod_compress."""
    r = _BitReader(frame)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t = _to_signed64(r.read(64))
    out[0] = t
    delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = r.read(7) - 63
            elif r.read(1) == 0:
                dod = r.read(9) - 255
            elif r.read(1) == 0:
                dod = r.read(12) - 2047
            else:
                dod = _to_signed64(r.read(64))
        delta += dod
        t += delta
        out[i] = t
    return out


# ---------------------------------------------------------------------------
# C2: Gorilla XOR values
# ---------------------------------------------------------------------------


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def gorilla_compress(vs: np.ndarray) -> bytes:
    """C2 kernel: int64 values -> frame bytes (XOR chain on u64 lanes)."""
    vs = np.asarray(vs, dtype=np.int64)
    n = len(vs)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    u = vs.view(np.uint64)
    w.write(int(u[0]), 64)
    xors = (u[1:] ^ u[:-1]).tolist() if n > 1 else []
    lead_prev, trail_prev = -1, -1
    for x in xors:
        if x == 0:
            w.write(0, 1)
            continue
        lead, trail = _clz64(x), _ctz64(x)
        if lead_prev >= 0 and lead >= lead_prev and trail >= trail_prev:
            w.write(0b10, 2)
            w.write(x >> trail_prev, 64 - lead_prev - trail_prev)
        else:
            mlen = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(mlen - 1, 6)
            w.write(x >> trail, mlen)
        # window = actual shape of the last non-zero xor (module docstring)
        lead_prev, trail_prev = lead, trail
    return w.bytes()


def gorilla_decompress(frame: bytes) -> np.ndarray:
    """C3 inverse of gorilla_compress."""
    r = _BitReader(frame)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.int64)
    cur = r.read(64)
    out[0] = cur
    lead_prev, trail_prev = -1, -1
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 0:
            meaningful = r.read(64 - lead_prev - trail_prev)
            x = meaningful << trail_prev
        else:
            lead = r.read(6)
            mlen = r.read(6) + 1
            meaningful = r.read(mlen)
            x = meaningful << (64 - lead - mlen)
        # mirror the encoder: window follows the decoded xor's actual shape
        lead_prev, trail_prev = _clz64(x), _ctz64(x)
        cur ^= x
        out[i] = cur
    return out.view(np.int64)


# ---------------------------------------------------------------------------
# Vectorized multi-frame encoders (the hot path; byte-identical to the
# sequential references above — pinned by tests/test_compression.py)
# ---------------------------------------------------------------------------

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _bitlen_arr(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length over u64 (0 -> 0)."""
    x = x.copy()
    bl = (x > 0).astype(np.int64)
    for sh in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(sh))
        bl[m] += sh
        x[m] >>= np.uint64(sh)
    return bl


def _ctz_arr(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros over u64 (0 -> 64)."""
    low = x & (~x + np.uint64(1))  # isolate lowest set bit
    return np.where(x == 0, 64, _bitlen_arr(low) - 1)


def _cumsum0(a: np.ndarray) -> np.ndarray:
    return np.concatenate(([0], np.cumsum(a)))


def _scatter_or(words: np.ndarray, idx: np.ndarray, contrib: np.ndarray) -> None:
    """words[idx] |= contrib with idx SORTED (duplicates allowed): group by
    run boundaries and OR each run via reduceat — no per-element Python and
    no ufunc.at."""
    if idx.size == 0:
        return
    starts = np.concatenate(([0], np.flatnonzero(np.diff(idx)) + 1))
    words[idx[starts]] |= np.bitwise_or.reduceat(contrib, starts)


def _pack_frames(ev: np.ndarray, eb: np.ndarray, ec: np.ndarray) -> list:
    """Bit-pack entry streams into per-frame byte strings.

    ``ev``/``eb`` are (value, nbits<=64) entry arrays laid out frame-major
    (MSB-first semantics identical to _BitWriter, zero-padded final byte);
    ``ec`` is entries-per-frame. All arithmetic is vectorized; each entry's
    bits land in at most two u64 words of one contiguous big-endian buffer
    where every frame starts byte-aligned. Returns a list of bytes (one
    slice per frame — the only per-frame Python)."""
    estarts = _cumsum0(ec)[:-1]
    fbits = np.add.reduceat(eb, estarts) if eb.size else np.zeros(0, np.int64)
    fbytes = (fbits + 7) // 8
    fboff = _cumsum0(fbytes)
    cb = _cumsum0(eb)[:-1]
    within = cb - np.repeat(cb[estarts], ec)
    goff = np.repeat(fboff[:-1] * 8, ec) + within
    words = np.zeros(int(fboff[-1]) // 8 + 2, dtype=np.uint64)

    use = eb > 0
    v = ev[use]
    nb = eb[use].astype(np.uint64)
    off = goff[use]
    v = v & np.where(nb == 64, _M64, (np.uint64(1) << nb) - np.uint64(1))
    w = off >> 6
    o = (off & 63).astype(np.uint64)
    end = o + nb
    spill = end > 64
    # main word holds the entry's high bits: left-align when it fits,
    # right-shift the spilling low bits away otherwise (one shift is 0)
    sh1 = np.where(spill, end - np.uint64(64), np.uint64(64) - end)
    shr = np.where(spill, sh1, np.uint64(0))
    shl = np.where(spill, np.uint64(0), sh1)
    _scatter_or(words, w, (v >> shr) << shl)
    if spill.any():
        sv = v[spill]
        sh2 = np.uint64(128) - end[spill]
        _scatter_or(words, w[spill] + 1, (sv << sh2) & _M64)
    buf = memoryview(words.astype(">u8").tobytes())
    return [bytes(buf[fboff[f]: fboff[f + 1]]) for f in range(len(ec))]


def _entry_layout(counts: np.ndarray) -> tuple:
    """Shared frame-major entry layout: every frame gets 2 header slots
    ((n,32) and, when n>=1, (first,64)); every later value gets exactly 2
    slots (second possibly zero-width). Returns (ec, base, E, starts,
    frame_of, local) for ``counts`` values per frame."""
    counts = np.asarray(counts, dtype=np.int64)
    starts = _cumsum0(counts)[:-1]
    ec = np.maximum(2 * counts, 2)
    base = _cumsum0(ec)[:-1]
    e_total = int(ec.sum())
    frame_of = np.repeat(np.arange(counts.size), counts)
    local = np.arange(int(counts.sum())) - np.repeat(starts, counts)
    return ec, base, e_total, starts, frame_of, local


def dod_compress_many(ts_flat: np.ndarray, counts: np.ndarray) -> list:
    """Vectorized C1 over many frames: ``ts_flat`` holds every frame's
    ascending int64 timestamps back-to-back; ``counts`` the per-frame
    lengths. Byte-identical to dod_compress per frame."""
    ts = np.asarray(ts_flat, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    ec, base, e_total, starts, frame_of, local = _entry_layout(counts)
    ev = np.zeros(e_total, dtype=np.uint64)
    eb = np.zeros(e_total, dtype=np.int64)
    ev[base] = counts.astype(np.uint64)
    eb[base] = 32
    ne = counts > 0
    ev[base[ne] + 1] = ts[starts[ne]].view(np.uint64)
    eb[base[ne] + 1] = 64
    i = np.flatnonzero(local >= 1)
    if i.size:
        d = ts[i] - ts[i - 1]
        dall = np.zeros(ts.size, dtype=np.int64)
        dall[i] = d
        # dod: first delta's predecessor is 0 by definition
        dod = np.where(local[i] >= 2, d - dall[i - 1], d)
        e1 = np.repeat(base, counts)[i] + 2 * local[i]
        v1 = np.zeros(i.size, dtype=np.uint64)
        b1 = np.full(i.size, 1, dtype=np.int64)
        v2 = np.zeros(i.size, dtype=np.uint64)
        b2 = np.zeros(i.size, dtype=np.int64)
        done = dod == 0
        for hi, off, nbits, prefix, plen in _DOD_BUCKETS:
            m = (~done) & (dod >= -hi + 1) & (dod <= hi)
            v1[m] = (np.uint64(prefix) << np.uint64(nbits)) | (
                (dod[m] + off).astype(np.uint64)
            )
            b1[m] = plen + nbits
            done |= m
        big = ~done
        v1[big] = 0b1111
        b1[big] = 4
        v2[big] = dod[big].view(np.uint64)
        b2[big] = 64
        ev[e1], eb[e1], ev[e1 + 1], eb[e1 + 1] = v1, b1, v2, b2
    return _pack_frames(ev, eb, ec)


def gorilla_compress_many(vals_flat: np.ndarray, counts: np.ndarray) -> list:
    """Vectorized C2 over many frames (format in module docstring).
    Byte-identical to gorilla_compress per frame: the previous-non-zero-xor
    window is a prefix scan clamped at frame starts, so every branch
    decision is elementwise."""
    vs = np.asarray(vals_flat, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    u = vs.view(np.uint64)
    ec, base, e_total, starts, frame_of, local = _entry_layout(counts)
    ev = np.zeros(e_total, dtype=np.uint64)
    eb = np.zeros(e_total, dtype=np.int64)
    ev[base] = counts.astype(np.uint64)
    eb[base] = 32
    ne = counts > 0
    ev[base[ne] + 1] = u[starts[ne]]
    eb[base[ne] + 1] = 64
    i = np.flatnonzero(local >= 1)
    if i.size:
        n = u.size
        x = u[i] ^ u[i - 1]
        xall = np.zeros(n, dtype=np.uint64)
        xall[i] = x
        # position of the last non-zero xor at-or-before each position;
        # frame starts hold no xor, so clamping to >= start+1 == same frame
        nzpos = np.where(xall != 0, np.arange(n), -1)
        np.maximum.accumulate(nzpos, out=nzpos)
        prevnz = np.concatenate(([-1], nzpos[:-1]))[i]
        fstart = np.repeat(starts, counts)[i]
        has_prev = prevnz >= fstart + 1
        px = xall[np.maximum(prevnz, 0)]
        lead = 64 - _bitlen_arr(x)
        trail = _ctz_arr(x)
        plead = 64 - _bitlen_arr(px)
        ptrail = _ctz_arr(px)
        zero = x == 0
        fits = has_prev & ~zero & (lead >= plead) & (trail >= ptrail)
        fresh = ~zero & ~fits
        pml = 64 - plead - ptrail          # '10' payload width
        ml = 64 - lead - trail             # '11' payload width
        v1 = np.zeros(i.size, dtype=np.uint64)
        b1 = np.full(i.size, 1, dtype=np.int64)  # zero branch: '0'
        v1[fits] = 0b10
        b1[fits] = 2
        v1[fresh] = (
            (np.uint64(0b11) << np.uint64(12))
            | (lead[fresh].astype(np.uint64) << np.uint64(6))
            | (ml[fresh] - 1).astype(np.uint64)
        )
        b1[fresh] = 14
        sh = np.where(fits, ptrail, np.where(fresh, trail, 0)).astype(np.uint64)
        v2 = x >> np.minimum(sh, np.uint64(63))
        b2 = np.where(fits, pml, np.where(fresh, ml, 0))
        e1 = np.repeat(base, counts)[i] + 2 * local[i]
        ev[e1], eb[e1], ev[e1 + 1], eb[e1 + 1] = v1, b1, v2, b2
    return _pack_frames(ev, eb, ec)


# ---------------------------------------------------------------------------
# Spark integration (the only applyInPandas in the engine)
# ---------------------------------------------------------------------------


def _compress_batch_groups(pdf, out_rows: list) -> None:
    """Split one sorted pandas batch into (doc_id, bucket) runs with NumPy
    boundary detection and compress every run through the vectorized
    multi-frame codecs — the only per-group Python is assembling the
    output row tuples."""
    doc = pdf["doc_id"].to_numpy()
    buck = pdf["bucket"].to_numpy()
    t = pdf["t"].to_numpy(dtype=np.int64)
    v = pdf["v"].to_numpy(dtype=np.float64)  # NaN = null
    change = np.flatnonzero((doc[1:] != doc[:-1]) | (buck[1:] != buck[:-1])) + 1
    starts = np.concatenate(([0], change))
    mask = ~np.isnan(v)
    counts = np.add.reduceat(mask.astype(np.int64), starts) if len(pdf) else []
    frames_t = dod_compress_many(t[mask], counts)
    frames_v = gorilla_compress_many(v[mask].astype(np.int64), counts)
    out_rows.extend(
        zip(doc[starts], buck[starts].tolist(), frames_t, frames_v)
    )


def attach_compression(rollup_df, flagged_points, tier: str):
    """Join ts_dod / v_gorilla payloads (computed per (doc_id, bucket) from
    the raw points) onto a rollup tier.

    Arrow path: mapInPandas over doc_id-co-partitioned, (doc_id, bucket, t)-
    sorted batches — one Python call per Arrow batch (~100k rows), not per
    group, with a carry buffer for groups spanning batch boundaries. Each
    group is <= bucket-width points (86400 worst case for 1d — bounded,
    SURVEY.md §4 spill row).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from engine.schema import TIER_SECONDS

    b = TIER_SECONDS[tier]

    def compress_partition(batches):
        carry = None
        rows: list = []
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the trailing group — it may continue in the next batch
            doc = pdf["doc_id"].to_numpy()
            buck = pdf["bucket"].to_numpy()
            last_change = np.flatnonzero(
                (doc[1:] != doc[:-1]) | (buck[1:] != buck[:-1])
            )
            if len(last_change) == 0:
                carry = pdf
                continue
            cut = int(last_change[-1]) + 1
            _compress_batch_groups(pdf.iloc[:cut], rows)
            carry = pdf.iloc[cut:].reset_index(drop=True)
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "bucket", "ts_dod", "v_gorilla"]
                )
                rows = []
        if carry is not None and len(carry):
            _compress_batch_groups(carry, rows)
        if rows:
            yield pd.DataFrame(
                rows, columns=["doc_id", "bucket", "ts_dod", "v_gorilla"]
            )

    pts = (
        flagged_points.withColumn("bucket", F.expr(f"t DIV {b}"))
        .select("doc_id", "bucket", "t", "v")
        .repartition("doc_id")
        .sortWithinPartitions("doc_id", "bucket", "t")
    )
    payloads = pts.mapInPandas(
        compress_partition,
        schema="doc_id string, bucket long, ts_dod binary, v_gorilla binary",
    )
    return rollup_df.join(payloads, ["doc_id", "bucket"], "left")


def rollup_1m_with_payloads(flagged_points, tier: str = "1m", presorted: bool = True):
    """Fused A1+C1+C2: one mapInPandas pass emits the FULL rollup row —
    aggregates and compression payloads together.

    Why fused: the compression kernels need one Python pass over every
    point anyway; computing the (doc_id, bucket) aggregates inside the same
    pass costs a few NumPy reductions per group, while the alternative
    (Catalyst rollup JOIN mapInPandas payloads) executes the upstream
    explode+window pipeline TWICE (once per join branch) plus a join
    shuffle. At 100 TB that is the difference between one scan and two.

    Aggregate float policy matches engine/rollup.py exactly: vsum is an
    exact int64 sum, vmean = double(vsum)/cnt — bit-identical to the
    Catalyst path and the oracle (pinned by test_fused_rollup_matches_catalyst).

    Ordering contract: the input must be hash(doc_id)-partitioned and
    sorted by (doc_id, t) within partitions. detect()'s window guarantees
    exactly that, so no extra exchange is needed; the explicit
    repartition+sort is applied only when ``presorted=False``.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    from engine.schema import EPOCH0_EPOCH_SECONDS, TIER_SECONDS

    b = TIER_SECONDS[tier]

    def rollup_partition(batches):
        carry = None
        rows: list = []

        def emit(pdf):
            doc = pdf["doc_id"].to_numpy()
            buck = pdf["bucket"].to_numpy()
            t = pdf["t"].to_numpy(dtype=np.int64)
            v = pdf["v"].to_numpy(dtype=np.float64)
            anom = pdf["is_anom"].to_numpy(dtype=np.bool_)
            change = np.flatnonzero((doc[1:] != doc[:-1]) | (buck[1:] != buck[:-1])) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pdf)]))
            mask_all = ~np.isnan(v)
            counts = np.add.reduceat(mask_all.astype(np.int64), starts)
            frames_t = dod_compress_many(t[mask_all], counts)
            frames_v = gorilla_compress_many(
                v[mask_all].astype(np.int64), counts
            )
            for g, (s, e) in enumerate(zip(starts.tolist(), ends.tolist())):
                vv = v[s:e]
                mask = ~np.isnan(vv)
                nn = vv[mask].astype(np.int64)
                cnt = int(nn.size)
                vsum = int(nn.sum()) if cnt else None
                rows.append(
                    (
                        doc[s],
                        int(buck[s]),
                        cnt,
                        int(nn.min()) if cnt else None,
                        int(nn.max()) if cnt else None,
                        vsum,
                        float(vsum) / cnt if cnt else None,
                        int(anom[s:e].sum()),
                        int(nn[0]) if cnt else None,
                        int(nn[-1]) if cnt else None,
                        frames_t[g],
                        frames_v[g],
                    )
                )

        cols = [
            "doc_id", "bucket", "cnt", "vmin", "vmax", "vsum", "vmean",
            "anom_cnt", "first_v", "last_v", "ts_dod", "v_gorilla",
        ]
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            doc = pdf["doc_id"].to_numpy()
            buck = pdf["bucket"].to_numpy()
            last_change = np.flatnonzero((doc[1:] != doc[:-1]) | (buck[1:] != buck[:-1]))
            if len(last_change) == 0:
                carry = pdf
                continue
            cut = int(last_change[-1]) + 1
            emit(pdf.iloc[:cut])
            carry = pdf.iloc[cut:].reset_index(drop=True)
            if rows:
                yield pd.DataFrame(rows, columns=cols)
                rows = []
        if carry is not None and len(carry):
            emit(carry)
        if rows:
            yield pd.DataFrame(rows, columns=cols)

    pts = flagged_points.withColumn("bucket", F.expr(f"t DIV {b}")).select(
        "doc_id", "bucket", "t", "v", "is_anom"
    )
    if not presorted:
        pts = pts.repartition("doc_id").sortWithinPartitions("doc_id", "bucket", "t")
    out = pts.mapInPandas(
        rollup_partition,
        schema=(
            "doc_id string, bucket long, cnt long, vmin int, vmax int, "
            "vsum long, vmean double, anom_cnt long, first_v int, "
            "last_v int, ts_dod binary, v_gorilla binary"
        ),
    )
    return out.withColumn(
        "bucket_ts",
        F.timestamp_seconds(F.lit(EPOCH0_EPOCH_SECONDS) + F.col("bucket") * F.lit(b)),
    ).select(
        "doc_id", "bucket", "bucket_ts", "cnt", "vmin", "vmax", "vsum",
        "vmean", "anom_cnt", "first_v", "last_v", "ts_dod", "v_gorilla",
    )


def decompress_columns(compressed_df):
    """C3 as a scalar Arrow UDF: (ts_dod, v_gorilla) -> point arrays."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, LongType

    # lambdas, not annotated defs: `from __future__ import annotations` turns
    # hints into strings pyspark cannot resolve inside a nested scope
    _ts = F.pandas_udf(
        lambda frames: frames.map(
            lambda b: dod_decompress(bytes(b)).tolist() if b is not None else None
        ),
        ArrayType(LongType()),
    )
    _vs = F.pandas_udf(
        lambda frames: frames.map(
            lambda b: gorilla_decompress(bytes(b)).tolist() if b is not None else None
        ),
        ArrayType(LongType()),
    )

    return compressed_df.withColumn("ts_points", _ts("ts_dod")).withColumn(
        "v_points", _vs("v_gorilla")
    )
