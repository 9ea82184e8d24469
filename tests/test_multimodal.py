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

    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0....", "image/jpeg")


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
