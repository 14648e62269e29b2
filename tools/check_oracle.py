#!/usr/bin/env python3
"""Pre-submit oracle check mimicking the driver's t2 gate (SURVEY.md §5.2).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

For each query in oracle_sql.json: run the SQL in DuckDB over the fixture
parquet tables, read the Spark parquet dump, sort columns by name, and
compare row-by-row (row ORDER matters — every query must emit a total
order). Exit 1 on any mismatch.
"""
import duckdb
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Normalize a cell for comparison across engines."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # values are pre-rounded by the queries; format to kill last-ulp noise
        return f"{v:.6g}" if v == 0 else f"{v:.10g}"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    return [cols[i] for i in order], [tuple(norm(r[i]) for i in order) for r in data]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass, fails = 0, []
    for name in sorted(oracle):
        try:
            ocols, orows = rows_of(con.execute(oracle[name]))
            scols, srows = rows_of(con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"))
        except Exception as e:
            fails.append((name, f"EXEC ERROR: {e}"))
            continue
        if ocols != scols:
            fails.append((name, f"SCHEMA: oracle={ocols} spark={scols}"))
            continue
        if len(orows) != len(srows):
            fails.append((name, f"ROWCOUNT: oracle={len(orows)} spark={len(srows)}"))
            continue
        bad = [(i, o, s) for i, (o, s) in enumerate(zip(orows, srows)) if o != s]
        if bad:
            i, o, s_ = bad[0]
            fails.append((name, f"VALUES: {len(bad)}/{len(orows)} rows differ; "
                                f"first at row {i}:\n  oracle={o}\n  spark ={s_}"))
            continue
        n_pass += 1
        print(f"  PASS {name} ({len(orows)} rows)")
    for name, msg in fails:
        print(f"  FAIL {name}: {msg}")
    print(f"\n{n_pass}/{len(oracle)} queries match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
