#!/usr/bin/env python3
"""DuckDB side of the fixed-vs-marginal-cost measurement (graft.Crossover).

Runs the same four query shapes on lineitem replicated xN (read_parquet of
the same file listed N times - identical input to Spark's unionByName) and
prints per-N timings. Comparing the per-row SLOPE between engines separates
Spark's fixed scheduling cost (amortizes at scale) from real per-row cost.
Usage: python3 tools/crossover_duck.py <sfDir> [reps-csv]
"""
import json, sys, time
import duckdb

# each wrapped in a checksum that FORCES the expensive columns (a bare
# count(*) would let the optimizer prune the aggregates / window entirely,
# under-measuring DuckDB; Spark's noop sink materializes every column)
QUERIES = {
    "agg": """SELECT sum(sq + ap + n) FROM (
              SELECT l_returnflag, l_linestatus, sum(l_quantity) sq,
              avg(l_extendedprice) ap, count(*) n FROM li
              GROUP BY l_returnflag, l_linestatus)""",
    "window": """SELECT sum(rk) FROM (
              SELECT rank() OVER (PARTITION BY l_returnflag
              ORDER BY l_quantity DESC, l_orderkey, l_linenumber) rk FROM li)""",
    "join": """SELECT sum(rev) FROM (
              SELECT o_orderstatus, sum(l_extendedprice * (1 - l_discount)) rev
              FROM li JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderstatus)""",
    "topk": """SELECT sum(l_quantity) FROM (
              SELECT * FROM li ORDER BY l_quantity DESC, l_orderkey,
              l_linenumber LIMIT 100)""",
}

def main(sf_dir, reps):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')")
    out = {}
    for n in reps:
        files = [f"{sf_dir}/lineitem.parquet"] * n
        con.execute("DROP VIEW IF EXISTS li")
        con.execute(f"CREATE VIEW li AS SELECT * FROM read_parquet({files!r})")
        times = {}
        for name, sql in QUERIES.items():
            t0 = time.time()
            con.execute(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        out[f"x{n}"] = times
    print(json.dumps({"metric": "crossover", "engine": "duckdb",
                      "sf": sf_dir, "reps": reps, **out}))

if __name__ == "__main__":
    reps = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,4,8").split(",")]
    main(sys.argv[1], reps)
