#!/usr/bin/env python3
"""DuckDB single-node baseline on the headline oracle queries.

The reference delegates execution to in-process DuckDB, so timing the oracle
SQL at the bench scale factor gives the closest available reference-engine
number (the reference publishes none). Usage:
    python3 tools/bench_duck.py <sfDir> <verifyOutDir>
reads oracle_sql.json from <verifyOutDir> (written by graft.Verify).
"""
import json, sys, time
import duckdb

HEADLINE = ["q1_agg", "q_filter", "q_project", "q_group_counts", "q_nunique",
            "q_quantile", "q_window_rank", "q_window_cumsum", "q_topk_per_group",
            "q_order_limit", "q_join_inner", "q_asof", "q_union_all",
            "q_dedup_exact", "q_stream_session", "q_fingerprint", "q_ann_topk"]

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in HEADLINE:
        sql = oracles.get(name)
        if not sql:
            continue
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            results[name] = round(time.time() - t0, 3)
        except Exception as e:
            print(f"# {name} failed: {e}", file=sys.stderr)
    total = round(sum(results.values()), 3)
    print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                      "queries": results, "sf": sf_dir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
