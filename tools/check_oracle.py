"""Local replay of the driver's __spark_entry__ correctness gate.

Runs every queries()[name] on Spark and oracle_sql()[name] on DuckDB over
the same sf dir, then compares row count, sorted column names, and the
order-insensitive multiset of row values (floats exact — both sides are
expected to round explicitly; see __spark_entry__ float policy).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb  # noqa: E402


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(x):
    if x is None:
        return None
    if isinstance(x, bool):
        return bool(x)
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return float(x)
    if isinstance(x, int):
        return float(x) if abs(x) < 2**52 else x
    return str(x)


def _norm_rows(rows):
    return sorted(
        [tuple(_norm_cell(c) for c in row) for row in rows],
        key=lambda r: tuple((v is None, str(type(v)), str(v)) for v in r),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # The ANN oracles' plane count is a pure function of the corpus size
    # (ann_planes), resolved from SPARK_GRAFT_ORACLE_SF at oracle_sql()
    # call time (ADVICE r03 mechanism). Point it at THIS gate's sf dir so
    # a replay at any scale stays in parity — without this, a sf0.1 gate
    # compares 7-plane Spark signatures against a 4-plane (sf0.01) oracle
    # (caught by the round-6 both-scale replay: ann_lsh_topk 8-row
    # mismatch, embedding_near_dups 119 vs 263 pairs).
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import __spark_entry__ as entrymod
    from engine.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    results: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            try:
                n = fn(spark, sf_dir).count()
                results[name] = "rows_only"
                print(f"{name:28s} ROWS-ONLY rows={n}")
            except Exception as e:
                failures += 1
                results[name] = "spark_error"
                print(f"{name:28s} SPARK-ERROR {e}")
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [
                tuple(row[c] for c in scols) for row in sdf.collect()
            ]
        except Exception as e:
            failures += 1
            results[name] = "spark_error"
            print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {str(e)[:160]}")
            continue
        try:
            # Output-type lint (round-5 verdict task #1): DuckDB's
            # sum(BIGINT) silently widens to HUGEINT (int128) and
            # sum/avg over DECIMAL stays DECIMAL — both hash differently
            # from Spark's BIGINT/DOUBLE under a typed (Arrow) compare
            # even when every value is equal. House style: every oracle
            # casts its sums, so any HUGEINT/DECIMAL output column is a
            # missed cast. Binding is cheap (no execution).
            bad_types = [
                (c, str(t))
                for c, t in zip(con.sql(sql).columns, con.sql(sql).types)
                if "HUGEINT" in str(t).upper() or "DECIMAL" in str(t).upper()
            ]
            if bad_types:
                failures += 1
                results[name] = "type_lint"
                print(f"{name:28s} ORACLE-TYPE-LINT {bad_types} (cast sums to BIGINT/DOUBLE)")
                continue
            res = con.execute(sql)
            dcols_raw = [d[0] for d in res.description]
            drows_raw = res.fetchall()
            dorder = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
            dcols = [dcols_raw[i] for i in dorder]
            drows = [tuple(row[i] for i in dorder) for row in drows_raw]
        except Exception as e:
            failures += 1
            results[name] = "duckdb_error"
            print(f"{name:28s} DUCKDB-ERROR {type(e).__name__}: {str(e)[:160]}")
            continue
        if scols != dcols:
            failures += 1
            results[name] = "cols_mismatch"
            print(f"{name:28s} COLS-MISMATCH spark={scols} duckdb={dcols}")
            continue
        if len(srows) != len(drows):
            failures += 1
            results[name] = "rowcount_mismatch"
            print(f"{name:28s} ROWCOUNT spark={len(srows)} duckdb={len(drows)}")
            continue
        a, b = _norm_rows(srows), _norm_rows(drows)
        if a != b:
            failures += 1
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            results[name] = "values_mismatch"
            print(f"{name:28s} VALUES-MISMATCH {len([1 for x, y in zip(a, b) if x != y])} rows, e.g. {diff}")
            continue
        results[name] = "ok"
        print(f"{name:28s} OK rows={len(srows)} cols={scols}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    out = os.environ.get("SPARK_GRAFT_ORACLE_JSON")
    if out:
        # durable machine-readable replay record (committed under BENCH/
        # per round so the judge can read the gate result from the repo,
        # not a /tmp log)
        import json

        Path(out).write_text(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(results),
                    "failures": failures,
                    "results": results,
                },
                indent=1,
                sort_keys=True,
            )
            + "\n"
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
