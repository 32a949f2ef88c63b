#!/usr/bin/env python
"""End-to-end driver simulation (the /verify recipe).

Unlike tools/oracle_sweep.py (which uses the engine's own get_spark),
this drives __spark_entry__.py the way the EXTERNAL driver does: a
vanilla SparkSession with no engine conf, so any conf an operator needs
must be set inside the operator itself.

Usage: python tools/driver_sim.py [sf_dir] [only_query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.oracle_sweep import compare, normalize  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    import __spark_entry__ as E

    if not only:
        n = len(E.entry(spark).collect())
        print(f"entry(): {n} rows {'OK' if n >= 0 else 'FAIL'}", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, os_ = E.queries(), E.oracle_sql()
    fails = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got_pdf = fn(spark, sf_dir).toPandas()
            if name in os_:
                got = normalize(got_pdf)
                want = normalize(con.execute(os_[name]).fetchdf())
                err = compare(got, want)
                status = "OK " if err is None else f"FAIL {err}"
                results[name] = {"check": "exact", "ok": err is None,
                                 "rows": len(got_pdf), "err": err}
            else:
                status = f"ROWS-ONLY n={len(got_pdf)}" + (
                    " FAIL empty" if len(got_pdf) == 0 else ""
                )
                results[name] = {"check": "rows_only", "ok": len(got_pdf) > 0,
                                 "rows": len(got_pdf), "err": None}
            if "FAIL" in status:
                fails += 1
        except Exception as exc:
            status, fails = f"ERROR {type(exc).__name__}: {exc}", fails + 1
            results[name] = {"check": "error", "ok": False, "rows": 0,
                             "err": f"{type(exc).__name__}: {exc}"}
        print(f"{name:28s} {time.time()-t0:7.2f}s  {status}", flush=True)
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    if not only:
        # committable evidence for ALL registered queries — the external
        # driver's CORRECTNESS_r{N}.json caps at 50 of them
        import json

        out = {"sf_dir": sf_dir, "n_queries": len(results),
               "n_fail": fails, "results": results}
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "CORRECTNESS_LOCAL.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(f"# wrote {path}", flush=True)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
