"""Simulate the driver's correctness gate with a BARE SparkSession.

The driver harness builds its own session with none of our confs
(round 1 lost all 31 events-based queries to the TIMESTAMP(NANOS)
parquet type because of exactly this gap). This script mirrors that:
plain builder, then run every queries() entry against its oracle_sql()
on DuckDB at the given sf dir, comparing row count, sorted column
names, and sorted-row values.

Usage: python tools/driver_sim.py [sf_dir] [query_name ...]
       python tools/driver_sim.py [sf_dir] --sample N [--seed S]

--sample runs a seeded random N-subset of the queries() names (the
driver's own gate samples a fixed subset the same way — sweeping
seeded samples locally surfaces flake classes that only appear in
sampled bare-session runs before the driver sees them).
"""

from __future__ import annotations

import json
import math
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
    rows = [
        tuple(None if (isinstance(v, float) and math.isnan(v)) or v is pd.NA else v
              for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def main() -> int:
    argv = sys.argv[1:]
    sample_n, seed = None, 0
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i:i + 2]
    if "--sample" in argv:
        i = argv.index("--sample")
        sample_n = int(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    # bare session — intentionally NO graphouse_spark.session confs
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if sample_n is not None:
        import random

        names = sorted(queries)
        chosen = random.Random(seed).sample(names, min(sample_n, len(names)))
        only = set(chosen)
        print(f"# sampled {len(only)}/{len(names)} queries (seed={seed})")
    results: dict[str, dict] = {}
    bad = 0
    if not only or sample_n is not None:
        # the driver also smoke-runs entry() on ITS bare session — mirror it
        try:
            n = entry_mod.entry(spark).count()
            print(f"ok   entry() ({n} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL entry(): {type(e).__name__}: {e}")
            bad += 1
    for name in sorted(queries):
        if only and name not in only:
            continue
        rec: dict = {}
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                ddf = con.execute(oracles[name]).fetchdf()
                rec["oracle_rows"] = len(ddf)
                rec["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
                s_rows, d_rows = normalize(sdf), normalize(ddf)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["hash_match"] = rec["rows_match"] and all(
                    a == b for a, b in zip(s_rows, d_rows)
                )
                ok = rec["schema_match"] and rec["hash_match"]
            else:
                rec["rows_only"] = True
                ok = True
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"
            ok = False
        if not ok:
            bad += 1
            print(f"FAIL {name}: {json.dumps(rec)[:400]}")
        else:
            print(f"ok   {name} ({rec.get('spark_rows')} rows)")
        results[name] = rec

    print(f"\n{len(results) - bad}/{len(results)} pass")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
