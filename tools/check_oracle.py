"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name, values
stringified with float rounding). Exit code 1 if anything mismatches.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def canon(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.9g}"
    if isinstance(value, bytes):
        return value.hex()
    return str(value)


def frame_signature(columns: list[str], rows: list[tuple]) -> tuple:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols_sorted = [columns[i] for i in order]
    canon_rows = sorted(
        tuple(canon(row[i]) for i in order) for row in rows
    )
    import hashlib
    h = hashlib.sha256()
    for row in canon_rows:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return cols_sorted, len(rows), h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from drune_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for table in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {table} AS "
            f"SELECT * FROM '{sf_dir}/{table}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"  ok {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        ssig = frame_signature(scols, srows)
        osig = frame_signature(ocols, orows)
        if ssig == osig:
            print(f"  ok {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
            print(f"FAIL {name}: spark(cols={ssig[0]}, n={ssig[1]}, h={ssig[2][:12]}) "
                  f"vs duckdb(cols={osig[0]}, n={osig[1]}, h={osig[2][:12]})")
            if ssig[0] == osig[0] and ssig[1] == osig[1]:
                sset = {tuple(canon(v) for v in row) for row in srows}
                oset = {tuple(canon(v) for v in row) for row in orows}
                diff1 = list(sset - oset)[:3]
                diff2 = list(oset - sset)[:3]
                print(f"    spark-only sample: {diff1}")
                print(f"    duckdb-only sample: {diff2}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
