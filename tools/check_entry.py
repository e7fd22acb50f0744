"""Local emulation of the driver's correctness gate: run every queries()
entry at sf0.01 and compare with the DuckDB oracle (row count + column names
+ order-insensitive values). Usage: python tools/check_entry.py [sf_dir]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from flume_elasticsearch_2_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    spark = get_spark(app_name="check-entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    if not only:
        res = entrymod.entry(spark)
        print(f"entry(): {len(res.collect())} rows, schema={res.schema.simpleString()}")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    unknown = [n for n in only if n not in qs]
    if unknown:
        # a typo'd name must not read as a green run
        print(f"  ERROR unknown entry names: {unknown}")
        failures += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
            sdf = sdf.reindex(sorted(sdf.columns), axis=1)
            if name not in os_:
                print(f"  {name}: rows={len(sdf)} (no oracle — rows-only)")
                continue
            odf = con.sql(os_[name]).df()
            odf = odf.reindex(sorted(odf.columns), axis=1)
            ok_rows = len(sdf) == len(odf)
            ok_cols = list(sdf.columns) == list(odf.columns)
            svals = sorted(map(repr, sdf.itertuples(index=False, name=None)))
            ovals = sorted(map(repr, odf.itertuples(index=False, name=None)))
            ok_vals = svals == ovals
            status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
            if status == "FAIL":
                failures += 1
                print(f"  {name}: {status} rows {len(sdf)}/{len(odf)} cols {ok_cols} vals {ok_vals}")
                if not ok_vals:
                    diff = [(a, b) for a, b in zip(svals, ovals) if a != b][:3]
                    print(f"    first diffs: {diff}")
            else:
                print(f"  {name}: OK ({len(sdf)} rows)")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"  {name}: ERROR {type(e).__name__}: {e}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
