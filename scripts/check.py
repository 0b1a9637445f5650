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
    # Resource caps: at sf1-class inputs a single heavy oracle (the 4-round
    # label-propagation CTE chain) can spill DuckDB temp until the DISK is
    # full, killing the whole sweep. Cap memory and temp so the worst case
    # is one ORACLE-ERR line, not a dead machine. Overridable via env.
    con.sql(f"SET memory_limit='{os.environ.get('GRAFT_CHECK_MEM', '48GB')}'")
    con.sql(f"SET temp_directory='{out_dir}/.duckdb_tmp'")
    con.sql("SET max_temp_directory_size='"
            + os.environ.get("GRAFT_CHECK_TMP", "30GB") + "'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    # Resume lever for long sf1-class sweeps: GRAFT_CHECK_START=<name>
    # skips everything alphabetically before <name> (inclusive start);
    # GRAFT_CHECK_ONLY=a,b restricts to a subset.
    start = os.environ.get("GRAFT_CHECK_START")
    if start:
        names = [n for n in names if n >= start]
    only = os.environ.get("GRAFT_CHECK_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]
    n_pass = n_fail = n_rowsonly = 0
    # GRAFT_CHECK_JSON=<path>: also emit a machine-readable standing
    # record (per-query status + counts) — what scripts/sweep_sf.sh
    # commits as the scaling-evidence artifact.
    record = {}
    for name in names:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY?"
            n_rowsonly += 1
            record[name] = {"status": "rows-only", "rows": len(got)}
            print(f"  {status:10} {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  ORACLE-ERR {name}: {e}")
            record[name] = {"status": "oracle-err", "detail": str(e)[:300]}
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
            record[name] = {"status": "pass", "rows": len(got)}
            print(f"  PASS       {name}: {len(got)} rows")
        else:
            n_fail += 1
            record[name] = {"status": "fail", "detail": "; ".join(msgs)[:300]}
            print(f"  FAIL       {name}: {'; '.join(msgs)}")
    # A query that CRASHED inside Verify leaves no dump dir (Verify
    # catches per-query exceptions and continues) but its oracle entry
    # remains — silently skipping it would let a broken query read as a
    # clean sweep. Count every oracle key without a dump as a failure —
    # within the resume/subset window, if one is active (a filtered run
    # must not flag the queries it deliberately skipped).
    missing = set(oracle) - set(names)
    if start:
        missing = {n for n in missing if n >= start}
    if only:
        missing = {n for n in missing if n in keep}
    for name in sorted(missing):
        n_fail += 1
        record[name] = {"status": "missing",
                        "detail": "declared oracle but no result dump"}
        print(f"  MISSING    {name}: declared oracle but no result dump "
              f"(query crashed in Verify?)")
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    json_out = os.environ.get("GRAFT_CHECK_JSON")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "out_dir": out_dir,
                       "pass": n_pass, "fail": n_fail,
                       "rows_only": n_rowsonly, "queries": record},
                      f, indent=1, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
