"""Emulates the driver's correctness gate: runs every __spark_entry__
query against its DuckDB oracle at a given sf dir and reports row-count +
schema + order-insensitive value-hash matches.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _value_hash(rows: list[tuple], colnames: list[str]) -> str:
    """Order-insensitive: sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def canon(v):
        import decimal

        if v is None:
            return "∅"
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, bool):
            return str(int(v))
        if isinstance(v, decimal.Decimal):
            # DuckDB sum(int) is HUGEINT -> arrow decimal128; the driver's
            # hasher distinguishes it from BIGINT, so we must too (r1 lesson:
            # token_stats/sessionize/cube_events failed only driver-side)
            return f"dec:{v}"
        return str(v)

    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from lsh_cascade_poc_spark.session import get_spark

    spark = get_spark(app_name="oracle_check",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qmap = entry.queries()
    omap = entry.oracle_sql()
    failures = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in omap:
            print(f"{name:26s} rows-only: {len(srows)} rows  cols={scols}")
            continue
        try:
            rel = con.sql(omap[name])
            ocols = rel.columns
            # fetch through Arrow so HUGEINT/DECIMAL survive as Decimal
            # instead of being silently coerced to Python int by fetchall()
            orows = [
                tuple(d[c] for c in ocols) for d in rel.arrow().to_pylist()
            ]
        except Exception as e:
            print(f"{name:26s} ORACLE SQL ERROR: {str(e)[:160]}")
            failures += 1
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh = _value_hash(srows, scols)
        oh = _value_hash(orows, ocols)
        ok_hash = sh == oh
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "MISMATCH"
        print(
            f"{name:26s} {status}  rows {len(srows)}/{len(orows)}"
            f"  cols {'=' if ok_cols else scols + ['|'] + ocols}"
            f"  hash {'=' if ok_hash else sh + '!=' + oh}"
        )
        if status == "MISMATCH":
            failures += 1
            if not ok_hash and ok_rows and ok_cols:
                # show a few differing rows for debugging
                sset = {tuple(map(str, r)) for r in srows}
                oset = {tuple(map(str, r)) for r in orows}
                print("   spark-only:", list(sset - oset)[:2])
                print("   oracle-only:", list(oset - sset)[:2])
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
