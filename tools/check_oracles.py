"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir; compare row count, column names, and an
order-insensitive value hash.
Usage: python tools/check_oracles.py [sf_dir] [name_prefix]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def _norm(v):
    if v is None:
        return "\x00"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def main(sf_dir: str, prefix: str = "") -> int:
    from openie_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def fresh_con():
        c = duckdb.connect()
        # explicit limits + a spill dir: large-sf oracle CTEs (the
        # recursive closure, blocked self-joins) otherwise hit DuckDB's
        # in-memory pool and fail with a hard bad-allocation.
        c.execute("SET memory_limit='48GB'")
        c.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c

    con = fresh_con()

    qs, os_ = e.queries(), e.oracle_sql()
    fail = 0
    for name, fn in qs.items():
        if prefix and not name.startswith(prefix):
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in os_:
            print(f"{name:28s} rows={len(srows):7d}  (no oracle — rows-only)")
            continue
        try:
            res = con.execute(os_[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"{name:28s} ORACLE ERROR: {ex}")
            fail += 1
            # a DuckDB OOM poisons the connection (every later query
            # spuriously fails) — reconnect so failures stay per-query
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con()
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        ok_h = ok_c and value_hash([tuple(r) for r in srows], scols) == value_hash(drows, dcols)
        status = "OK" if (ok_n and ok_c and ok_h) else "MISMATCH"
        print(f"{name:28s} rows={len(srows):7d}/{len(drows):7d} cols={'=' if ok_c else '!'} hash={'=' if ok_h else '!'} {status}")
        if status != "OK":
            fail += 1
            if not ok_c:
                print(f"   spark cols: {scols}\n   duck  cols: {dcols}")
            else:
                # show first differing rows for debug
                s = sorted(tuple(_norm(v) for v in r) for r in srows)
                d = sorted(tuple(_norm(v) for v in r) for r in drows)
                sd = [x for x in s if x not in set(map(tuple, d))][:3]
                ds = [x for x in d if x not in set(map(tuple, s))][:3]
                print(f"   spark-only: {sd}\n   duck-only:  {ds}")
    return fail


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else ""))
