"""Multimodal plumbing tests: schema, Arrow batch shape, stub decode
determinism, frame sampling, resize planning (task brief: plumbing real,
codec stubbed)."""

from __future__ import annotations

import numpy as np
import pytest

from engine.multimodal import (
    FEATURE_DIM,
    decode_real,
    decode_stub,
    extract_features,
    resize_meta,
    sample_frames,
    synth_media,
)


def test_decode_real_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_real(b"xx", "image/png")


def test_decode_stub_deterministic():
    a = decode_stub(b"hello", "image/png")
    b = decode_stub(b"hello", "image/png")
    assert np.array_equal(a, b) and a.shape == (FEATURE_DIM,)
    assert not np.array_equal(a, decode_stub(b"other", "image/png"))
    assert np.isnan(decode_stub(None, "x")).all()


def test_extract_features_end_to_end(spark):
    media = synth_media(spark, 64)
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == 64
    by_id = {r["doc_id"]: r for r in rows}
    # null payloads -> n_bytes 0, features None (row preserved, not dropped)
    assert by_id["media_00000"]["n_bytes"] == 0
    assert by_id["media_00000"]["features"] is None
    r = by_id["media_00001"]
    assert r["n_bytes"] == 64  # utf-8 of a sha2 hex string
    assert len(r["features"]) == FEATURE_DIM
    # driver-side replay of the stub must match the executor result exactly
    payload = {m["doc_id"]: m["payload"] for m in media.collect()}["media_00001"]
    want = decode_stub(bytes(payload), "application/octet-stream")
    assert np.allclose(np.array(r["features"], dtype=np.float32), want)


def test_sample_frames(spark):
    media = synth_media(spark, 30)
    frames = sample_frames(media, every_n=10)
    rows = frames.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    # a video with n_frames=10+6*10=... every video doc has >= 1 sampled frame
    vids = media.where("kind = 'video'").count()
    assert frames.select("doc_id").distinct().count() == vids


def test_resize_meta(spark):
    media = synth_media(spark, 30)
    rows = {r["doc_id"]: r for r in resize_meta(media, max_side=256).collect()}
    for r in rows.values():
        assert 0 < r["scale"] <= 1.0
        assert r["target_w"] <= 256 + 1 and r["target_h"] <= 256 + 1


def _make_ppm(w, h, rgb):
    header = f"P6\n# test comment\n{w} {h}\n255\n".encode()
    px = np.tile(np.array(rgb, np.uint8), w * h)
    return header + px.tobytes()


def _make_bmp(w, h, bgr):
    stride = (w * 3 + 3) & ~3
    row = (np.tile(np.array(bgr, np.uint8), w).tobytes()
           + b"\x00" * (stride - w * 3))
    pix = row * h
    header = (b"BM" + (54 + len(pix)).to_bytes(4, "little") + b"\x00" * 4
              + (54).to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little") + h.to_bytes(4, "little")
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(pix).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + pix


def _make_wav(sr, samples):
    data = np.asarray(samples, "<i2").tobytes()
    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + sr.to_bytes(4, "little") + (sr * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    return (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + len(data).to_bytes(4, "little") + data)


def test_decode_real_ppm_bmp_wav():
    """decode_real actually decodes bytes in-sandbox (round-2 task #7):
    solid-color PPM and BMP of the same color produce IDENTICAL features;
    WAV stats match closed forms; exotic formats still raise."""
    from engine.multimodal import FEATURE_DIM, decode_real

    ppm = decode_real(_make_ppm(10, 4, (200, 100, 50)), "image/x-portable-pixmap")
    assert ppm.shape == (FEATURE_DIM,)
    assert np.allclose(ppm[2:5], np.array([200, 100, 50]) / 255.0, atol=1e-6)
    assert np.allclose(ppm[5:8], 0.0)  # solid color -> zero std
    assert np.isclose(ppm[8:16].sum(), 1.0)  # histogram fractions

    bmp = decode_real(_make_bmp(10, 4, (50, 100, 200)), "image/bmp")  # BGR order
    assert np.allclose(bmp, ppm, atol=1e-6)

    wav = decode_real(_make_wav(16000, [0, 16384, -16384, 0] * 100), "audio/wav")
    assert np.isclose(wav[0], 16000 / 48000)
    assert np.isclose(wav[2], 0.0, atol=1e-6)  # symmetric -> zero mean
    assert np.isclose(wav[4], np.sqrt(np.mean((np.array([0, .5, -.5, 0] * 100)) ** 2)), atol=1e-3)

    # no dependency-free video decoder: the narrowed integration point
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00\x00\x00\x18ftypmp42....", "video/mp4")


def _make_png(px: np.ndarray, width, height, ctype, filters):
    """Minimal PNG encoder for tests: applies the INVERSE of each row's
    requested filter so decode must reconstruct exactly. px: (h*w, bpp)."""
    import struct
    import zlib

    bpp = px.shape[1]
    rows = px.reshape(height, width * bpp).astype(np.int64)
    stride = width * bpp
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = filters[y % len(filters)]
        rec = rows[y]
        if f == 0:
            raw = rec
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), rec[:-bpp]])
            raw = (rec - left) & 255
        elif f == 2:
            raw = (rec - prev) & 255
        elif f == 3:
            raw = np.zeros(stride, np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                raw[i] = (rec[i] - (a + prev[i]) // 2) & 255
        else:  # Paeth
            raw = np.zeros(stride, np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                raw[i] = (rec[i] - pred) & 255
        out.append(f)
        out += bytes(raw.astype(np.uint8))
        prev = rec

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


def test_decode_real_png_all_filters():
    """PNG decode (round 4): every filter type (None/Sub/Up/Average/Paeth)
    must reconstruct exactly — features equal the directly-computed ones;
    RGB and grayscale and RGBA agree with their raw-pixel twins; palette
    raises the narrowed NotImplementedError."""
    from engine.multimodal import _image_features, decode_real

    rng = np.random.default_rng(3)
    w, h = 17, 15
    rgb = rng.integers(0, 256, (w * h, 3)).astype(np.uint8)
    want = _image_features(rgb, w, h)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        png = _make_png(rgb, w, h, ctype=2, filters=filters)
        got = decode_real(png, "image/png")
        assert np.allclose(got, want, atol=1e-7), filters

    gray = rng.integers(0, 256, (w * h, 1)).astype(np.uint8)
    g = decode_real(_make_png(gray, w, h, ctype=0, filters=[4]), "image/png")
    assert np.allclose(g, _image_features(np.repeat(gray, 3, axis=1), w, h))

    rgba = np.concatenate([rgb, np.full((w * h, 1), 200, np.uint8)], axis=1)
    a = decode_real(_make_png(rgba, w, h, ctype=6, filters=[1, 2]), "image/png")
    assert np.allclose(a, want, atol=1e-7)

    import struct
    import zlib

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    pal = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00")))
    with pytest.raises(NotImplementedError, match="palette|colortype=3"):
        decode_real(pal, "image/png")


def test_decode_real_wav_data_chunk_before_fmt():
    """Legal RIFF ordering puts 'data' before 'fmt ' — fmt fields must
    still apply (ADVICE r03: one-pass walk used mono/16-bit defaults, so
    stereo mis-reshaped and the PCM16 guard was skipped)."""
    from engine.multimodal import decode_real

    # stereo: L channel constant +8192, R channel constant -8192 -> after
    # correct de-interleave the mono mix is exactly 0
    frames = np.array([8192, -8192] * 200, "<i2")
    data = frames.tobytes()
    fmt = ((1).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (32000).to_bytes(4, "little")
           + (4).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    wav_data_first = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"data" + len(data).to_bytes(4, "little") + data
        + b"fmt " + (16).to_bytes(4, "little") + fmt
    )
    f = decode_real(wav_data_first, "audio/wav")
    assert np.isclose(f[0], 8000 / 48000)
    assert np.isclose(f[2], 0.0, atol=1e-9)   # stereo mix cancels exactly
    assert np.isclose(f[3], 0.0, atol=1e-9)   # constant mix -> zero std

    # and a data-first NON-16-bit file must hit the guard, not decode
    fmt8 = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    wav8 = (
        b"RIFF" + (36 + 4).to_bytes(4, "little") + b"WAVE"
        + b"data" + (4).to_bytes(4, "little") + b"\x80\x80\x80\x80"
        + b"fmt " + (16).to_bytes(4, "little") + fmt8
    )
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_real(wav8, "audio/wav")


def test_extract_features_with_real_decoder(spark):
    """The Spark plumbing runs decode_real end-to-end on real payloads."""
    from engine.multimodal import MEDIA_SCHEMA, decode_real, extract_features

    rows = [
        ("m1", "image", _make_ppm(6, 6, (10, 20, 30)),
         ("image/x-portable-pixmap", 6, 6, None, None)),
        ("m2", "image", _make_bmp(8, 2, (30, 20, 10)),
         ("image/bmp", 8, 2, None, None)),
        ("m3", "audio", _make_wav(8000, [100, -100] * 50),
         ("audio/wav", None, None, 8000, None)),
        ("m4", "image", None, ("image/bmp", 0, 0, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["doc_id"]: r for r in extract_features(media, decoder=decode_real).collect()}
    assert np.allclose(out["m1"]["features"][2:5], np.array([10, 20, 30]) / 255.0, atol=1e-6)
    assert np.allclose(out["m2"]["features"][2:5], np.array([10, 20, 30]) / 255.0, atol=1e-6)
    assert out["m3"]["n_bytes"] > 0 and abs(out["m3"]["features"][0] - 8000 / 48000) < 1e-6
    assert out["m4"]["features"] is None


class _JpegWriter:
    """Bit writer with JPEG byte stuffing (0x00 after every 0xFF)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v, nb):
        for i in range(nb - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.bits(1, 1)  # pad with 1s
        return bytes(self.out)


def _fixed_len_huff(symbols):
    """Canonical table: every used symbol at one fixed length L with
    2^L > n (the all-ones code stays unused, per spec). Returns
    (bits16, vals, {sym: (code, L)})."""
    vals = sorted(set(symbols))
    n = len(vals)
    L = max(2, (n + 1).bit_length())
    bits = [0] * 16
    bits[L - 1] = n
    enc = {s: (i, L) for i, s in enumerate(vals)}
    return bits, vals, enc


def _make_jpeg(px, width, height, q=4, subsample=False):
    """Minimal baseline JPEG encoder for tests: float FDCT + quantize +
    zigzag + run-length symbols + custom canonical Huffman tables, one
    interleaved scan, 4:4:4 (or 4:2:0 when subsample=True)."""
    import struct

    from engine.multimodal import _DCT_M, _ZIGZAG

    rgb = px.reshape(height, width, 3).astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    planes = [
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ]
    if subsample:
        hv = [(2, 2), (1, 1), (1, 1)]
        # chroma: 2x2 box mean on even-padded planes
        for ci in (1, 2):
            p = planes[ci]
            ph = p[: (height // 2) * 2, : (width // 2) * 2]
            planes[ci] = (ph[0::2, 0::2] + ph[1::2, 0::2]
                          + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
    else:
        hv = [(1, 1), (1, 1), (1, 1)]
    Q = np.full((8, 8), q, dtype=np.int64)
    maxh = max(h for h, v in hv)
    maxv = max(v for h, v in hv)
    # block-quantized coefficients per component
    mcux = -(-width // (8 * maxh))
    mcuy = -(-height // (8 * maxv))
    blocks = []  # per comp: dict[(by, bx)] = zigzag int array
    for p, (ch, cv) in zip(planes, hv):
        need_h, need_w = mcuy * cv * 8, mcux * ch * 8
        p = np.pad(p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])), mode="edge")
        d = {}
        for by in range(need_h // 8):
            for bx in range(need_w // 8):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = _DCT_M @ blk @ _DCT_M.T
                zz = np.round(coef / Q).astype(np.int64).reshape(64)[_ZIGZAG]
                d[(by, bx)] = zz
        blocks.append(d)

    def mag(v):
        return int(abs(v)).bit_length()

    # one pass to collect symbols per (class, table): luma table 0, chroma 1
    tbl_of = [0, 1, 1]
    dc_syms = {0: [], 1: []}
    ac_syms = {0: [], 1: []}
    dc_prev = [0, 0, 0]

    def block_symbols(zz, ci, emit=None):
        s = mag(zz[0] - dc_prev[ci])
        if emit is None:
            dc_syms[tbl_of[ci]].append(s)
        else:
            emit("dc", ci, s, zz[0] - dc_prev[ci])
        dc_prev[ci] = zz[0]
        run = 0
        last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                if run == 16:
                    if emit is None:
                        ac_syms[tbl_of[ci]].append(0xF0)
                    else:
                        emit("ac", ci, 0xF0, None)
                    run = 0
                continue
            sym = (run << 4) | mag(zz[k])
            if emit is None:
                ac_syms[tbl_of[ci]].append(sym)
            else:
                emit("ac", ci, sym, zz[k])
            run = 0
        if last_nz < 63:
            if emit is None:
                ac_syms[tbl_of[ci]].append(0x00)
            else:
                emit("ac", ci, 0x00, None)

    def walk(emit=None):
        for ci in range(3):
            dc_prev[ci] = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (ch, cv) in enumerate(hv):
                    for byy in range(cv):
                        for bxx in range(ch):
                            zz = blocks[ci][(my * cv + byy, mx * ch + bxx)]
                            block_symbols(zz, ci, emit)

    walk(None)
    dc_tabs = {t: _fixed_len_huff(s) for t, s in dc_syms.items() if s}
    ac_tabs = {t: _fixed_len_huff(s) for t, s in ac_syms.items() if s}

    w = _JpegWriter()

    def emit(kind, ci, sym, val):
        enc = (dc_tabs if kind == "dc" else ac_tabs)[tbl_of[ci]][2]
        code, L = enc[sym]
        w.bits(code, L)
        if kind == "dc":
            s = sym
            if s:
                v = val if val >= 0 else val + (1 << s) - 1
                w.bits(v, s)
        elif sym not in (0x00, 0xF0):
            s = sym & 15
            v = val if val >= 0 else val + (1 << s) - 1
            w.bits(v, s)

    walk(emit)
    scan = w.flush()

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    zz_q = np.zeros(64, dtype=np.uint8)
    zz_q[:] = Q.reshape(64)[_ZIGZAG]
    seg(0xDB, bytes([0x00]) + bytes(zz_q))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([3])
    for ci, (ch, cv) in enumerate(hv):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    seg(0xC0, sof)
    for t, (bits, vals, _) in dc_tabs.items():
        seg(0xC4, bytes([0x00 | t]) + bytes(bits) + bytes(vals))
    for t, (bits, vals, _) in ac_tabs.items():
        seg(0xC4, bytes([0x10 | t]) + bytes(bits) + bytes(vals))
    sos = bytes([3])
    for ci in range(3):
        sos += bytes([ci + 1, (tbl_of[ci] << 4) | tbl_of[ci]])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(scan)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_decode_real_jpeg_baseline():
    """Baseline JPEG decode (round 4): encode with an independent FDCT +
    quantize + Huffman pipeline (test-side), decode through decode_real —
    per-channel means must agree within the quantization error bound; a
    smooth gradient round-trips pixel-close; 4:2:0 subsampling decodes;
    progressive SOF2 raises the narrowed NotImplementedError."""
    from engine.multimodal import FEATURE_DIM, _image_features, decode_real

    rng = np.random.default_rng(5)
    w, h = 24, 16

    # smooth gradient: low quant error, tight tolerance
    yy, xx = np.mgrid[0:h, 0:w]
    grad = np.stack(
        [32 + 5 * xx, 64 + 3 * yy, 96 + 2 * (xx + yy)], axis=2
    ).reshape(-1, 3).astype(np.uint8)
    got = decode_real(_make_jpeg(grad, w, h, q=2), "image/jpeg")
    want = _image_features(grad, w, h)
    assert got.shape == (FEATURE_DIM,)
    assert np.allclose(got[:2], want[:2])            # dims exact
    assert np.allclose(got[2:5], want[2:5], atol=0.02)  # channel means
    assert np.allclose(got[5:8], want[5:8], atol=0.03)  # channel stds

    # noise image: means still agree (quant error is zero-mean-ish)
    noise = rng.integers(0, 256, (w * h, 3)).astype(np.uint8)
    gn = decode_real(_make_jpeg(noise, w, h, q=4), "image/jpeg")
    wn = _image_features(noise, w, h)
    assert np.allclose(gn[2:5], wn[2:5], atol=0.05)

    # 4:2:0: solid color survives chroma subsampling exactly
    solid = np.tile(np.array([[180, 90, 40]], np.uint8), (w * h, 1))
    gs = decode_real(_make_jpeg(solid, w, h, q=2, subsample=True), "image/jpeg")
    ws = _image_features(solid, w, h)
    assert np.allclose(gs[2:5], ws[2:5], atol=0.02)
    assert np.allclose(gs[5:8], 0.0, atol=0.02)

    # progressive marker -> loud, narrow NotImplementedError
    prog = bytearray(_make_jpeg(solid, w, h))
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="baseline"):
        decode_real(bytes(prog), "image/jpeg")
