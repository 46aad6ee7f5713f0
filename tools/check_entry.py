"""Local replica of the driver's correctness gate.

Runs each __spark_entry__.queries() entry on Spark and, where present,
its oracle_sql() on DuckDB over the same parquet tables; compares row
count, sorted column-name schema, and an order-insensitive value
comparison (exact on sorted rows). Usage:

    python tools/check_entry.py [sf_dir] [name ...]

NOTE: sf0.01 is the authoritative gate. A few oracles whose hash
function DuckDB cannot express (xxhash64: minhash_lsh, simhash,
dedup_near; plus data-edge cases in feature_mi's log) are pinned
VALUES literals captured at sf0.01 — running this tool at sf0.001 or
sf0.1 reports them as mismatches BY DESIGN (the cross-SF evidence for
those ops is the XXH64-replica parity suite in tests/).
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from ir_base_spark.session import get_spark

    spark = get_spark(app_name="check-entry", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR: {ex}"))
            print(f"[FAIL-spark] {name}: {ex}")
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(sdf)} rows, cols={sorted(sdf.columns)}")
            if len(sdf) == 0 and name != "dedup_exact":
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append((name, f"ORACLE ERROR: {ex}"))
            print(f"[FAIL-sql  ] {name}: {ex}")
            continue
        a, b = _canon(sdf), _canon(odf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"schema {list(a.columns)} vs {list(b.columns)}"))
            print(f"[FAIL-schem] {name}: {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"[FAIL-rows ] {name}: {len(a)} vs {len(b)}")
            continue
        eq = a.equals(b)
        if not eq:
            diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
            failures.append((name, f"values differ in {diff_cols}"))
            print(f"[FAIL-vals ] {name}: differ in {diff_cols}")
            for c in diff_cols[:2]:
                neq = a[c] != b[c]
                print("  spark:", a.loc[neq, c].head(3).tolist())
                print("  duck :", b.loc[neq, c].head(3).tolist())
        else:
            print(f"[OK        ] {name}: {len(a)} rows")
    print()
    if failures:
        print("FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg}")
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
