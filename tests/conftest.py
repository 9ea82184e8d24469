"""Shared fixtures: one SparkSession per test run + deterministic token fixtures."""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from engine.schema import DEFAULT_WINDOW, TOKENS_SCHEMA  # noqa: E402
from engine.session import get_spark  # noqa: E402

W = DEFAULT_WINDOW  # 30


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", master="local[4]", shuffle_partitions=4)
    yield s


def _random_doc(rng: random.Random, i: int, length: int) -> dict:
    tokens = []
    for t in range(length):
        if rng.random() < 0.05:
            tokens.append(None)  # gap
        else:
            v = rng.randrange(50000)
            if rng.random() < 0.01:
                v += 144340  # +10 sigma spike
            tokens.append(v)
    return {
        "doc_id": f"doc_{i:08d}",
        "tokens": tokens,
        "n_tok": length,
        "source": rng.choices(
            ["cc", "wiki", "books", "code", "news"], weights=[70, 10, 8, 7, 5]
        )[0],
    }


def make_token_rows(n_random: int = 50, seed: int = 42) -> list[dict]:
    """Deterministic fixture table: named edge-case docs (FIXTURES.md F1)
    plus n_random mixed-length random docs. Pure-Python generation so the
    pandas oracle and Spark consume byte-identical input."""
    rng = random.Random(seed)
    rows = [
        {"doc_id": "doc_allgaps", "tokens": [None] * 40, "n_tok": 40, "source": "cc"},
        {"doc_id": "doc_const", "tokens": [7] * 80, "n_tok": 80, "source": "cc"},
        {
            "doc_id": "doc_short",  # n_tok = w-1 -> every stat NULL
            "tokens": list(range(W - 1)),
            "n_tok": W - 1,
            "source": "wiki",
        },
        {"doc_id": "doc_single", "tokens": [123], "n_tok": 1, "source": "code"},
        {"doc_id": "doc_empty", "tokens": [], "n_tok": 0, "source": "news"},
        {
            "doc_id": "doc_negmax",
            "tokens": [-(2**31), 2**31 - 1, -1, 0, None, 2**31 - 1, -(2**31)] * 10,
            "n_tok": 70,
            "source": "books",
        },
        {
            "doc_id": "doc_leadgap",  # leading gap stays null under ffill
            "tokens": [None, None, None] + [int(x) for x in range(100, 160)],
            "n_tok": 63,
            "source": "cc",
        },
    ]
    lengths = [1, W - 1, W, W + 1, 97, 200, 512]
    for i in range(n_random):
        rows.append(_random_doc(rng, i, lengths[i % len(lengths)]))
    return rows


@pytest.fixture(scope="session")
def token_rows():
    return make_token_rows()


@pytest.fixture(scope="session")
def tokens_df(spark, token_rows):
    return spark.createDataFrame(token_rows, TOKENS_SCHEMA).cache()


@pytest.fixture(scope="session")
def ora(token_rows):
    from engine import oracle

    return oracle.pipeline_oracle(token_rows)
