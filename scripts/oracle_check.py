"""Driver-contract replica: run every __spark_entry__ query against its
DuckDB oracle at a given sf dir and report rows/schema/hash matches.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
Mirrors the driver's CORRECTNESS gate: columns sorted by name, values
rounded via string repr, rows sorted, md5 over the whole frame.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for r in canon:
        h.update("|".join(r).encode())
        h.update(b"\n")
    return h.hexdigest()


def norm(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from approximate_anomaly_detection_in_data_streams_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cores=int(os.environ.get("AADS_TEST_CORES", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"create view {t} as select * from read_parquet('{p}/*.parquet')"
                if os.path.isdir(p)
                else f"create view {t} as select * from read_parquet('{p}')"
            )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        row = {"rows_match": None, "hash_match": None, "err": None}
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                row["err"] = "no_oracle"
                row["spark_rows"] = len(srows)
            else:
                ores = con.execute(oracles[name])
                ocols = [d[0] for d in ores.description]
                orows = ores.fetchall()
                row["spark_rows"] = len(srows)
                row["oracle_rows"] = len(orows)
                row["rows_match"] = len(srows) == len(orows)
                sc = canon_rows(scols, srows)
                oc = canon_rows(ocols, orows)
                row["hash_match"] = sc == oc
                if not row["hash_match"] and len(sc) == len(oc):
                    for a, b in zip(sc, oc):
                        if a != b:
                            row["first_diff"] = [a, b]
                            break
        except Exception as exc:  # noqa: BLE001
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results[name] = row
        status = (
            "PASS"
            if row.get("hash_match")
            else ("no_oracle" if row.get("err") == "no_oracle" else "FAIL")
        )
        print(f"{name}: {status} {json.dumps({k: v for k, v in row.items() if k != 'first_diff'})}")
        if "first_diff" in row:
            print("  first_diff:", row["first_diff"])
    n_pass = sum(1 for r in results.values() if r.get("hash_match"))
    print(f"== {n_pass}/{len(results)} hash-matched ==")
    spark.stop()


if __name__ == "__main__":
    main()
