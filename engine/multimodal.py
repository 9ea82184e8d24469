"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Task-brief contract: the image/audio libs are NOT in this container, so the
codec step is STUBBED — behind ``decode_stub`` (deterministic fake) and
``decode_real`` (NotImplementedError with the exact integration point) —
while everything Spark-side is real and tested: the schema, the
partition-preserving mapInPandas plumbing, the Arrow batch shape, and the
downstream feature columns.

Data model:

  media(doc_id string, kind string, payload binary, meta struct<
        mime string, width int, height int, sample_rate int, n_frames int>)

At 100 TB the rules are the ones that matter here:
  - payloads never pass through Python row-at-a-time: one mapInPandas over
    Arrow batches, bytes stay in Arrow buffers until the kernel touches them;
  - decode output is a FIXED-WIDTH feature vector (array<float>), so the
    downstream join/dedup path is identical to the embeddings path
    (__spark_entry__.q_embedding_topk);
  - frame sampling / resize parameters travel as plain columns, not
    closure state, so one plan serves heterogeneous media.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def decode_real(payload: bytes, mime: str) -> np.ndarray:
    """The real codec integration point (PIL / torchaudio / pyav).

    Not available in this container — see module docstring. A deployment
    installs the codec libs and replaces decode_stub with this in
    extract_features(..., decoder=decode_real).
    """
    raise NotImplementedError(
        "codec libs (PIL/torchaudio/pyav) are not installed in this "
        "container; wire them here — the Spark plumbing around this "
        "function is complete and tested with decode_stub"
    )


def decode_stub(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic fake decode: FEATURE_DIM floats derived from the
    sha256 of the payload. Keeps every byte of the Spark-side contract
    honest (batch shape, null handling, fixed-width output) and is
    reproducible for tests."""
    if payload is None:
        return np.full(FEATURE_DIM, np.nan, dtype=np.float32)
    digest = hashlib.sha256(bytes(payload)).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (raw.astype(np.float32) / 65535.0)[:FEATURE_DIM]


def extract_features(media: DataFrame, decoder=decode_stub) -> DataFrame:
    """Decode + featurize every payload: mapInPandas over Arrow batches.

    Output: (doc_id, kind, n_bytes long, features array<float>).
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            feats = [
                None
                if p is None
                else decoder(p, m).astype(np.float32).tolist()
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    flat = media.select(
        "doc_id", "kind", "payload", F.col("meta.mime").alias("mime")
    )
    return flat.mapInPandas(
        run, schema="doc_id string, kind string, n_bytes long, features array<float>"
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index — pure
    Catalyst (sequence + explode); the per-frame decode then rides the same
    extract_features path."""
    v = media.where(F.col("kind") == "video")
    idx = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
        F.lit(every_n),
    )
    return v.select(
        "doc_id", "payload", F.explode(idx).alias("frame_idx"), "meta"
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning as metadata arithmetic (the actual pixel work lives
    in the decoder): scale factor + target dims, Catalyst-only."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side,
        F.lit(max_side) / F.greatest(w, h).cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "doc_id",
        "kind",
        scale.alias("scale"),
        F.round(w * scale).cast("int").alias("target_w"),
        F.round(h * scale).cast("int").alias("target_h"),
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived from
    the row id (unambiguous, no codec needed)."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.format_string("media_%05d", F.col("id").cast("int")).alias("doc_id"),
        F.element_at(kinds, (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")).alias("kind"),
        F.when(F.pmod(F.col("id"), F.lit(11)) == 0, F.lit(None).cast("binary"))
        .otherwise(F.encode(F.sha2(F.col("id").cast("string"), 256), "utf-8"))
        .alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.pmod(F.col("id"), F.lit(5)).cast("int") * 100 + 100).alias("width"),
            (F.pmod(F.col("id"), F.lit(3)).cast("int") * 100 + 100).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.pmod(F.col("id"), F.lit(7)).cast("int") * 10 + 10).alias("n_frames"),
        ).alias("meta"),
    )
    return df
