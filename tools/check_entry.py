"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against the matching
``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, floats
rounded to 9 significant decimals before hashing).

Cross-SF sweep: ``python tools/check_entry.py --sf-dir /root/testdata/sf0.1``
re-runs the whole gate against another scale (the flag also points the
seam-artifact generation there via SPARK_GRAFT_GATE_SF_DIR, so the
MinHash/SimHash/LPA oracles follow).  Any remaining args filter by query
name.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from parallel_louvain_method_spark import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        df[c] = df[c].astype(str)
    if len(df) == 0:
        return hashlib.sha256(b"").hexdigest()[:16]
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main(only: list[str] | None = None) -> int:
    # imported HERE so --sf-dir's env override (set in __main__) reaches
    # the entry module's seam-artifact scale, which is read at import
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="check-entry", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        if name not in os_:
            print(f"rows  {name}: {len(sdf)} rows ({dt:.1f}s) [rows-only]")
            continue
        try:
            odf = con.execute(os_[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            hs, ho = value_hash(sdf), value_hash(odf)
            if hs != ho:
                problems.append(f"value-hash {hs} vs {ho}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt:.1f}s)")
            failures += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows ({dt:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    import os

    args = sys.argv[1:]
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        SF_DIR = args[i + 1]
        globals()["SF_DIR"] = SF_DIR
        os.environ["SPARK_GRAFT_GATE_SF_DIR"] = SF_DIR
        del args[i : i + 2]
    sys.exit(main(args or None))
