#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verifyOutDir> <sfDir>

Reads each <outDir>/<name>/ parquet result (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB with the sfDir
tables registered as views, and compares: row count, column names (sorted),
and values. Reports exact and tolerant (1e-9 rel) comparisons so FP-hash risk
is visible before the driver runs.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def rows_close(g, e):
    """Per-value comparison with a true RELATIVE tolerance (the docstring's
    1e-9 contract): absolute rounding under-reports closeness for large
    magnitudes; math.isclose handles both scales."""
    if len(g) != len(e):
        return False
    for a, b in zip(g, e):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if not (x == y or math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)):
                    return False
            elif x != y:
                return False
    return True

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            continue  # partial verify run (graft.Verify with a name filter)
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        problems = []
        # the driver's pandas comparator cannot sort/hash LIST/STRUCT cells —
        # flag them here so the crash is caught before the driver runs
        complex_cols = [d[0] for d in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchall() if "[" in d[1] or "STRUCT" in d[1] or "MAP" in d[1]]
        if complex_cols:
            problems.append(f"array/struct result cols {complex_cols} — driver harness crash RISK")
        # DuckDB sum(BIGINT) yields HUGEINT, which pandas converts to float64
        # while Spark's sum(long) stays int64 — hash-mismatch in the driver
        # even though fetchall() values compare equal here
        huge_cols = [d[0] for d in con.execute(f"DESCRIBE {sql}").fetchall()
                     if "HUGEINT" in d[1]]
        if huge_cols:
            problems.append(
                f"oracle HUGEINT cols {huge_cols} (pandas→float64) — "
                "CAST to BIGINT in the oracle SQL; driver hash RISK")
        if sorted(got_cols) != sorted(exp_cols):
            problems.append(f"cols got={sorted(got_cols)} exp={sorted(exp_cols)}")
        if len(got) != len(exp):
            problems.append(f"rows got={len(got)} exp={len(exp)}")
        if not problems:
            gi = [got_cols.index(c) for c in sorted(got_cols)]
            ei = [exp_cols.index(c) for c in sorted(exp_cols)]
            g = [tuple(r[i] for i in gi) for r in got]
            e = [tuple(r[i] for i in ei) for r in exp]
            exact_ordered = g == e
            gs, es = sorted(map(repr, g)), sorted(map(repr, e))
            exact_unordered = gs == es
            gn = sorted(g, key=lambda r: tuple(map(repr, map(norm, r))))
            en = sorted(e, key=lambda r: tuple(map(repr, map(norm, r))))
            tol_unordered = rows_close(gn, en)
            if exact_ordered:
                pass
            elif exact_unordered:
                problems.append("row ORDER differs (values match unordered)")
            elif tol_unordered:
                problems.append("values differ only within FP tolerance 1e-9 — hash RISK")
            else:
                diff = [(a, b) for a, b in zip(gs, es) if a != b][:3]
                problems.append(f"VALUES differ, e.g. {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
