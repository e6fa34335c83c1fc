#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir> [keys...]

Reads <outDir>/<name>/ parquet (Spark results written by graft.Verify) and
<outDir>/oracle_sql.json, creates DuckDB views (bare table names) over
<sfDir>/*.parquet, runs each oracle, and compares result multisets
(columns sorted by name, rows sorted, values normalized).

This is a *builder-side* tool only; the shipped Scala library has no Python
dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; engineered determinism means
        # matching cells must be bit-identical doubles.
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_to_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracles = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_path = Path(out_dir, name)
        if not spark_path.exists():
            print(f"[MISS] {name}: no spark result at {spark_path}")
            n_bad += 1
            continue
        try:
            oc = con.execute(sql)
            o_cols = [d[0] for d in oc.description]
            o_rows = oc.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"[ORACLE-ERR] {name}: {e}")
            n_bad += 1
            continue
        try:
            files = sorted(str(p) for p in spark_path.glob("*.parquet"))
            tbl = ds.dataset(files, format="parquet").to_table()
            s_cols = tbl.column_names
            s_rows = [tuple(r[c] for c in s_cols)
                      for r in tbl.to_pylist()] if tbl.num_rows else []
        except Exception as e:  # noqa: BLE001
            print(f"[SPARK-ERR] {name}: {e}")
            n_bad += 1
            continue
        oc_cols, oc_rows = table_to_rows(o_cols, o_rows)
        sc_cols, sc_rows = table_to_rows(s_cols, s_rows)
        if oc_cols != sc_cols:
            print(f"[COLS] {name}: spark={sc_cols} oracle={oc_cols}")
            n_bad += 1
            continue
        if oc_rows == sc_rows:
            print(f"[OK]   {name}: {len(sc_rows)} rows")
            n_ok += 1
        else:
            n_bad += 1
            print(f"[DIFF] {name}: spark {len(sc_rows)} rows vs oracle "
                  f"{len(oc_rows)} rows")
            so, oo = set(sc_rows), set(oc_rows)
            for r in list(so - oo)[:3]:
                print(f"    spark-only:  {r}")
            for r in list(oo - so)[:3]:
                print(f"    oracle-only: {r}")
    print(f"== {n_ok} ok / {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
