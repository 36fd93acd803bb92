"""Ad-hoc driver-contract sweep over a subset (or all) of the catalog.

Mirrors the external driver: runs each ``queries()`` entry at the given
sf dir and compares against its ``oracle_sql()`` via tests.oracle.compare
under a hostile session timezone.

Run: python tools/sweep_subset.py [sf_dir] [name ...]
     (no names = full catalog sweep)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TZ", "America/New_York")
time.tzset()

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from tests.oracle import compare, duck_connection


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if not names:
        names = list(qs)
    con = duck_connection(sf_dir)
    bad = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                compare(df, con, oracles[name])
                status = "match"
            else:
                assert df.count() >= 0
                status = "rows-only"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {e}"
            bad.append(name)
        print(f"[{i+1}/{len(names)}] {name}: {status} ({time.time()-t0:.1f}s)", flush=True)
    print(f"\n{len(names)-len(bad)}/{len(names)} green; failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
