"""Dump .explain('formatted') for named __spark_entry__ queries to files.

    python tools/dump_plans.py <out_dir> <suffix> [name ...]

Writes <out_dir>/<name>_<suffix>.txt for each query (default: all
ENTRY_BENCH_QUERIES).  Plan capture only — no job is executed beyond
what plan resolution needs.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from ir_base_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    qs = E.queries()
    if not names:
        names = list(qs)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{len(plan.splitlines())} lines -> {path}")


if __name__ == "__main__":
    main()
