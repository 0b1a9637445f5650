#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

For each <name>.parquet dumped by graft.Verify, runs the matching SQL from
oracle_sql.json in DuckDB over the same sfDir tables and compares:
row count, column names, and cell values (exact, after sorting columns by
name — rows are compared in dumped order since every query ends in a
deterministic ORDER BY).
"""
import sys, os, json, math
import duckdb

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY?"
            n_rowsonly += 1
            print(f"  {status:10} {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(got.columns) != sorted(exp.columns):
            ok = False
            msgs.append(f"cols {sorted(got.columns)} vs {sorted(exp.columns)}")
        elif len(got) != len(exp):
            ok = False
            msgs.append(f"rows {len(got)} vs {len(exp)}")
        else:
            g = got[sorted(got.columns)]
            e = exp[sorted(exp.columns)]
            # Mirror the driver's comparator, which row-sorts with pandas
            # sort_values over every column: nested cells (dict/list/
            # ndarray) are unhashable there and fail the whole query even
            # when values match in dumped order (CORRECTNESS_r04).
            try:
                g = g.sort_values(by=list(g.columns), ignore_index=True)
                e = e.sort_values(by=list(e.columns), ignore_index=True)
            except TypeError as te:
                ok = False
                msgs.append(f"driver-style row sort failed (nested output "
                            f"column?): {te}")
            for c in (g.columns if ok else []):
                gv = [canon(x) for x in g[c].tolist()]
                ev = [canon(x) for x in e[c].tolist()]
                if gv != ev:
                    bad = next(i for i in range(len(gv)) if gv[i] != ev[i])
                    ok = False
                    msgs.append(f"col {c} row {bad}: {gv[bad]} vs {ev[bad]}")
                    break
        if ok:
            n_pass += 1
            print(f"  PASS       {name}: {len(got)} rows")
        else:
            n_fail += 1
            print(f"  FAIL       {name}: {'; '.join(msgs)}")
    # A query that CRASHED inside Verify leaves no dump dir (Verify
    # catches per-query exceptions and continues) but its oracle entry
    # remains — silently skipping it would let a broken query read as a
    # clean sweep. Count every oracle key without a dump as a failure.
    for name in sorted(set(oracle) - set(names)):
        n_fail += 1
        print(f"  MISSING    {name}: declared oracle but no result dump "
              f"(query crashed in Verify?)")
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
