"""Local replica of the driver's CORRECTNESS sweep (round 5).

Runs every ``__spark_entry__.queries()`` entry IN REGISTRATION ORDER at the
duel corpus (sf0.01) inside one fresh session, duels each mirrored query
against its DuckDB oracle (same normalize-sort-compare as
tests/test_oracle_parity.py), and prints one JSON line with per-query wall
times — the evidence that the whole sweep fits the driver's budget (the r4
artifact truncated at 50 of 58 rows when the kg queries still paid live
extraction/linking inside the sweep).

    python -m scikg_spark.jobs.driver_replica [--sf-dir DIR] [--cores N]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)

    def nc(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else f"{v:.6g}"
        return str(v)

    n = df.map(nc)
    return n.sort_values(by=list(n.columns)).reset_index(drop=True)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"))
    parser.add_argument("--cores", type=int, default=32)
    args = parser.parse_args(argv)

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import __spark_entry__ as mod
    from scikg_spark.pipeline.session import get_spark

    spark = get_spark(app_name="scikg-driver-replica", cores=args.cores)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                     f"'{args.sf_dir}/{t}.parquet'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    t_total = time.time()
    per_query = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
            if name in oracles:
                ddf = duck.sql(oracles[name]).df()
                ok = (sorted(sdf.columns) == sorted(ddf.columns)
                      and len(sdf) == len(ddf)
                      and _normalize(sdf).equals(_normalize(ddf)))
                status = "duel_ok" if ok else "DUEL_FAIL"
            else:
                status = "rows_only"
            per_query[name] = {"status": status, "rows": len(sdf),
                               "sec": round(time.time() - t0, 2)}
        except Exception as ex:  # a failing query must not hide the rest
            per_query[name] = {"status": f"ERROR: {str(ex)[:120]}",
                               "rows": -1,
                               "sec": round(time.time() - t0, 2)}
    statuses = [q["status"] for q in per_query.values()]
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "total_queries": len(per_query),
        "duel_ok": statuses.count("duel_ok"),
        "rows_only": statuses.count("rows_only"),
        "fail": sum(1 for s in statuses
                    if s not in ("duel_ok", "rows_only")),
        "total_sec": round(time.time() - t_total, 1),
        "per_query": per_query,
    }))
    return 0 if all(s in ("duel_ok", "rows_only") for s in statuses) else 1


if __name__ == "__main__":
    raise SystemExit(main())
