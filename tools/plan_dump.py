#!/usr/bin/env python
"""Dump `.explain("formatted")` for named driver queries to files.

Writes one `<out_dir>/<query><suffix>.txt` per query — the evidence
format for optimization rounds (plans/r{N}/<query>_before.txt /
_after.txt). Runs against the package in the CURRENT working tree, so
checking out an older commit in a worktree and running this from there
produces the "before" plans.

Usage: python tools/plan_dump.py <out_dir> <suffix> <query> [query ...]
       python tools/plan_dump.py <out_dir> <suffix> ALL
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plan-dump")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dataframeutils_spark import driver as d

    qs = d.all_queries()
    if names == ["ALL"]:
        names = list(qs)
    rc = 0
    for name in names:
        fn = qs.get(name)
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        if fn is None:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            rc = 1
            continue
        try:
            df = fn(spark, SF_DIR)
            txt = (
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001 - keep dumping the rest
            print(f"{name}: ERR {e}", file=sys.stderr)
            rc = 1
            continue
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted) at {SF_DIR}\n\n")
            f.write(txt)
        print(f"{name}: {path} ({len(txt)} chars)")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
