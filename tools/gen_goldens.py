"""Generate tests/golden/*.json — frozen expected outputs for the named
edge-case docs (FIXTURES.md F4) under the pinned semantics (SURVEY.md §2.1
+ §2.1a, w=30, k=3.0, ffill).

Regenerate ONLY in the same commit that consciously changes the pinned
semantics (e.g. after reconciling a populated /root/reference):

    python tools/gen_goldens.py
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from engine import oracle  # noqa: E402
from tests.conftest import make_token_rows  # noqa: E402

GOLDEN_DOCS = [
    "doc_allgaps", "doc_const", "doc_short", "doc_single", "doc_empty",
    "doc_negmax", "doc_leadgap", "doc_00000000", "doc_00000005",
]


def _clean(x):
    if isinstance(x, float) and math.isnan(x):
        return None
    return x


def main() -> None:
    rows = {r["doc_id"]: r for r in make_token_rows()}
    out_dir = REPO / "tests" / "golden"
    out_dir.mkdir(parents=True, exist_ok=True)
    for doc_id in GOLDEN_DOCS:
        row = rows[doc_id]
        filled = oracle.gap_fill_series(row["tokens"], "ffill")
        st = oracle.rolling_stats_series(filled)
        payload = {
            "doc_id": doc_id,
            "pinned": {"w": 30, "k": 3.0, "policy": "ffill"},
            "tokens": row["tokens"],
            "filled": filled,
            "ma": [_clean(v) for v in st["ma"].tolist()],
            "sd": [_clean(v) for v in st["sd"].tolist()],
            "score": [_clean(v) for v in st["score"].tolist()],
            "is_anom": st["is_anom"].tolist(),
            "detect": st.loc[st["is_anom"], "t"].astype(int).tolist(),
        }
        with open(out_dir / f"{doc_id}.json", "w") as f:
            json.dump(payload, f)
        print(f"wrote {doc_id}: n={len(filled)} anomalies={payload['detect']}")


if __name__ == "__main__":
    main()
