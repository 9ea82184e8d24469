"""S1 ingest for footer-less formats (JSONL/CSV): roundtrip fidelity and
fail-fast validation (engine/io.py)."""

from __future__ import annotations

import os

import pytest




def test_jsonl_and_csv_ingest_roundtrip(spark, tmp_path):
    """S1 for footer-less formats: synth -> write jsonl/csv -> scan back
    must be row-identical (in-array gap nulls and empty arrays included)
    and pass the pinned-schema assert."""
    from engine.io import (
        scan_tokens_csv,
        scan_tokens_jsonl,
        synth_tokens,
        write_tokens_csv,
        write_tokens_jsonl,
    )

    df = synth_tokens(spark, 40, seed=5)
    want = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.collect()
    )
    jp, cp = str(tmp_path / "t.jsonl"), str(tmp_path / "t.csv")
    write_tokens_jsonl(df, jp)
    write_tokens_csv(df, cp)
    for scan, path in ((scan_tokens_jsonl, jp), (scan_tokens_csv, cp)):
        back = scan(spark, path)
        got = sorted(
            (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
            for r in back.collect()
        )
        assert got == want, scan.__name__
        assert [f.dataType.simpleString() for f in back.schema.fields] == [
            "string", "array<int>", "int", "string"
        ]


def test_jsonl_ingest_rejects_int32_overflow_and_malformed(spark, tmp_path):
    from engine.io import scan_tokens_jsonl

    p = str(tmp_path / "bad.jsonl")
    os.makedirs(p)
    with open(os.path.join(p, "part-0.json"), "w") as f:
        f.write('{"doc_id": "a", "tokens": [1, 4294967296], '
                '"n_tok": 2, "source": "cc"}\n')
    with pytest.raises(ValueError, match="int32"):
        scan_tokens_jsonl(spark, p)

    p2 = str(tmp_path / "mal.jsonl")
    os.makedirs(p2)
    with open(os.path.join(p2, "part-0.json"), "w") as f:
        f.write('{"doc_id": "a", "tokens": "not-an-array", "n_tok": 1, '
                '"source": "cc"}\n')
    with pytest.raises(Exception):
        scan_tokens_jsonl(spark, p2).collect()


def test_orc_ingest_roundtrip_and_drift(spark, tmp_path):
    """S1 over ORC: synth -> orc -> scan back row-identical through the
    pinned-schema assert; a drifted file (tokens array<long>) must fail
    fast at scan, not coerce."""
    import pytest
    from pyspark.sql import functions as F

    from engine.io import scan_tokens_orc, synth_tokens, write_tokens_orc

    df = synth_tokens(spark, 40, seed=5)
    want = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in df.collect()
    )
    p = str(tmp_path / "t.orc")
    write_tokens_orc(df, p)
    back = scan_tokens_orc(spark, p)
    got = sorted(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in back.collect()
    )
    assert got == want

    drifted = df.withColumn("tokens", F.col("tokens").cast("array<long>"))
    p2 = str(tmp_path / "drift.orc")
    drifted.write.orc(p2)
    with pytest.raises(ValueError, match="schema"):
        scan_tokens_orc(spark, p2)
