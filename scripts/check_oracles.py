#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracles.py <verify_out_dir> <sf_dir>

For each query dumped by `graft.Verify` (a parquet dir per query plus
oracle_sql.json), run the oracle SQL in DuckDB against views over the sf
tables and compare with the Spark result: columns sorted by name, rows
sorted, values stringified and hashed. Development-only — the shipped Scala
library never touches DuckDB.

The compare is DRIVER-FAITHFUL (pandas-asymmetric): the Spark side is read
via pandas.read_parquet, the oracle side via duckdb `.df()`. This is what
the driver does, and it is load-bearing: duckdb `.df()` renders HUGEINT
(e.g. an uncast sum()) as float64, so an oracle column the symmetric
fetchall compare calls "1435" the driver sees as "1435.0" — the r11/r12
driver-only hash-red on source_mixture_plan.
"""
import json, math, os, sys
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon_df(df):
    # case-insensitive column order so a Spark frame with ['A','b'] aligns
    # with an oracle frame with ['a','B'] (the name check below is
    # case-insensitive, so row rendering must use the same order)
    cols = sorted(df.columns, key=str.lower)
    # render COLUMN-WISE: iterrows() upcasts each row to a common dtype, so
    # a frame mixing int64 and float64 renders int cells as '1435.0' —
    # masking exactly the int-vs-float asymmetry this checker exists to
    # catch. Iterating each Series preserves its own dtype.
    out = ["\t".join(norm_cell(v) for v in row)
           for row in zip(*(df[c] for c in cols))]
    out.sort()
    return out


def fresh_con(sf_dir):
    # Fresh connection per oracle, capped at 4 threads: DuckDB 1.0.0's
    # PARALLEL window path returns nondeterministically wrong running sums
    # at high thread counts (reproduced at sf0.1 / threads=32: a windowed
    # DECIMAL cumsum flips between 7728 and the correct 7731; threads<=4
    # and a Python serial recomputation agree with Spark). Engine results
    # are correct — this caps the ORACLE evaluator below the buggy path.
    con = duckdb.connect(config={"threads": 4})
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            # Spark-written tables (the ScaleUp/VecScaleUp fixtures) are
            # part-file DIRECTORIES; DuckDB needs the glob form for those
            if os.path.isdir(p):
                p = os.path.join(p, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main(out_dir, sf_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as fp:
        oracles = json.load(fp)

    n_pass = n_fail = 0
    declared = sorted(d for d in os.listdir(out_dir)
                      if os.path.isdir(os.path.join(out_dir, d)))
    for name in declared:
        # connection closed per iteration (continue still runs the finally) —
        # 84 oracles would otherwise accumulate 84 open connections
        con = fresh_con(sf_dir)
        try:
            try:
                # driver-faithful: pandas reads the Spark parquet
                sdf = pd.read_parquet(os.path.join(out_dir, name))
            except Exception as e:
                print(f"FAIL {name}: cannot read spark output: {e}")
                n_fail += 1
                continue
            if name not in oracles:
                print(f"SKIP {name}: no oracle (rows-only: {len(sdf)} rows)")
                continue
            try:
                # driver-faithful: the oracle result goes through .df()
                odf = con.execute(oracles[name]).df()
            except Exception as e:
                print(f"FAIL {name}: oracle SQL error: {e}")
                n_fail += 1
                continue
            scols = sorted(sdf.columns, key=str.lower)
            ocols = sorted(odf.columns, key=str.lower)
            if [c.lower() for c in scols] != [c.lower() for c in ocols]:
                print(f"FAIL {name}: columns {scols} != {ocols}")
                n_fail += 1
                continue
            sc, oc = canon_df(sdf), canon_df(odf)
            if len(sc) != len(oc):
                print(f"FAIL {name}: rows {len(sc)} != {len(oc)}")
                n_fail += 1
            elif sc != oc:
                diffs = [i for i, (a, b) in enumerate(zip(sc, oc)) if a != b][:3]
                print(f"FAIL {name}: {len(sc)} rows, value mismatch at {diffs}")
                for i in diffs[:1]:
                    print(f"  spark:  {sc[i][:300]}")
                    print(f"  oracle: {oc[i][:300]}")
                n_fail += 1
            else:
                print(f"PASS {name}: {len(sc)} rows")
                n_pass += 1
        finally:
            con.close()
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(declared) - n_pass - n_fail} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
