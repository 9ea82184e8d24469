"""Z-order (Morton) interleave key for multi-dimensional file clustering.

The Delta `OPTIMIZE ZORDER BY` / Iceberg `sort_order(zorder(...))` shape:
when a table is filtered on TWO independent dimensions (here: point reads
by doc_id AND time-range scans on bucket_ts), sorting files by either
column alone makes the other's min/max footer stats useless. Interleaving
the bits of both keys gives every parquet row group a SMALL bounding
rectangle in (doc, time) space instead of a thin full-width stripe, so
both predicates prune row groups.

Built as a pure Catalyst expression tree (shiftright/&/|): 2·bits
shift-and-or terms, whole-stage-codegen'd, zero Python — usable inside any
write path as a sort expression without materializing a column.

Coordinate normalization is the caller's job and the honest contract at
100 TB (Delta samples range boundaries; we document the cheap determinis-
tic variants instead):
  - equality-lookup dimensions (doc_id): low bits of a 64-bit hash —
    equality still prunes (the reader recomputes the same hash), and the
    hash spreads skewed ids;
  - range-scan dimensions (bucket_ts): the tier bucket index itself —
    monotone in time, so time ranges map to z-ranges. With the default 16
    bits the time coordinate wraps every 2^16 buckets (~45 days of 1m
    buckets); files are clustered within a wrap period, which is exactly
    the horizon maintenance compaction runs over.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZORDER_BITS = 16


def interleave_bits(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative int columns:
    bit i of x lands at 2i, bit i of y at 2i+1. Returns a long in
    [0, 4^bits)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def rollup_zorder_key(bits: int = ZORDER_BITS) -> Column:
    """The tier-file clustering key: doc dimension = low bits of
    xxhash64(doc_id) (equality-prunable, skew-spread), time dimension =
    the tier's own integer ``bucket`` index (monotone in time — rollup
    rows carry it alongside bucket_ts, see engine/rollup.py)."""
    mask = F.lit((1 << bits) - 1)
    doc = F.xxhash64("doc_id").bitwiseAND(mask)
    ts = F.col("bucket").cast("long").bitwiseAND(mask)
    return interleave_bits(doc, ts, bits)
