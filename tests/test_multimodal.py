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
