#!/usr/bin/env python3
"""Pre-submit oracle check mimicking the driver's t2 gate (SURVEY.md §5.2).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

For each query in oracle_sql.json: run the SQL in DuckDB over the fixture
parquet tables, read the Spark parquet dump, sort columns by name, and
compare (a) arrow-level column TYPES (the driver's hash may be
type-sensitive: Spark int32 vs DuckDB int64 on derived columns is a real
hazard) and (b) values row-by-row in emitted order (queries must emit a
total order). Exit 1 on any mismatch.
"""
import duckdb
import json
import math
import sys
from datetime import datetime, date

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Normalize a cell for comparison across engines."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision: the r4/r6 discipline must make both engines
        # produce bit-identical doubles; 10 sig digits would mask exactly
        # the 4th-decimal drift on ~1e8-magnitude aggregates that this
        # tool exists to catch
        return f"{v:.17g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return repr(v)


def table_of(con, sql):
    t = con.execute(sql).arrow()
    names = sorted(t.column_names)
    schema = [(n, str(t.schema.field(n).type)) for n in names]
    rows = [tuple(norm(row[n]) for n in names) for row in t.to_pylist()]
    return schema, rows


def nonscalar_cols(schema):
    """Top-level list/struct/map columns. The DRIVER's comparator (pandas
    sort_values) crashes on these ('unhashable type: numpy.ndarray' —
    round-1 lesson), so the local gate must reject them even though our
    own norm() could handle them."""
    return [n for n, t in schema
            if t.startswith(("list", "large_list", "fixed_size_list",
                             "struct", "map"))]


# Type pairs we accept as equivalent (parquet logical nuances).
def type_eq(a, b):
    if a == b:
        return True
    eq = {frozenset({"timestamp[us]", "timestamp[ms]"}),
          frozenset({"timestamp[us, tz=UTC]", "timestamp[us]"}),
          frozenset({"large_string", "string"})}
    return frozenset({a, b}) in eq


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
            oschema, orows = table_of(con, oracle[name])
            sschema, srows = table_of(
                con, f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        except Exception as e:
            fails.append((name, f"EXEC ERROR: {e}"))
            continue
        ns = nonscalar_cols(oschema) + nonscalar_cols(sschema)
        if ns:
            fails.append((name, f"NON-SCALAR OUTPUT COLUMNS {sorted(set(ns))}: "
                                "driver comparator cannot hash arrays — "
                                "serialize with concat_ws/to_json"))
            continue
        if [c for c, _ in oschema] != [c for c, _ in sschema]:
            fails.append((name, f"COLUMNS: oracle={oschema} spark={sschema}"))
            continue
        tbad = [(o, s_) for o, s_ in zip(oschema, sschema)
                if not type_eq(o[1], s_[1])]
        if tbad:
            fails.append((name, f"TYPES: {tbad} (oracle vs spark)"))
            continue
        if len(orows) != len(srows):
            fails.append((name, f"ROWCOUNT: oracle={len(orows)} spark={len(srows)}"))
            continue
        bad = [(i, o, s_) for i, (o, s_) in enumerate(zip(orows, srows)) if o != s_]
        if bad:
            i, o, s_ = bad[0]
            fails.append((name, f"VALUES: {len(bad)}/{len(orows)} rows differ; "
                                f"first at row {i}:\n  oracle={o}\n  spark ={s_}"))
            continue
        n_pass += 1
        print(f"  PASS {name} ({len(orows)} rows)")
    # rows-only check for no-oracle queries (mimics the driver's weaker
    # gate): the dump must exist, be readable, and be non-empty. Iterate
    # the MANIFEST (queries.json, written by Verify) rather than the dump
    # dirs that happen to exist: a no-oracle query that crashed inside
    # Verify leaves no dump and would otherwise vanish from the check.
    import os
    dumped = {d for d in os.listdir(outdir)
              if os.path.isdir(os.path.join(outdir, d))}
    manifest_path = os.path.join(outdir, "queries.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            expected = set(json.load(f))
        for name in sorted(expected - dumped):
            fails.append((name, "MISSING DUMP: query in SparkEntry.queries "
                                "but no parquet written (crashed in Verify?)"))
    else:
        fails.append(("queries.json", "MANIFEST MISSING: Verify should write "
                                      "the full query-name list"))
    for name in sorted(dumped - set(oracle)):
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')"
            ).fetchone()[0]
            if n == 0:
                fails.append((name, "ROWS-ONLY: dump is EMPTY (0 rows)"))
            else:
                print(f"  ROWS {name} ({n} rows, no oracle)")
        except Exception as e:
            fails.append((name, f"ROWS-ONLY READ FAILED: {e}"))
    for name, msg in fails:
        print(f"  FAIL {name}: {msg}")
    print(f"\n{n_pass}/{len(oracle)} queries match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
