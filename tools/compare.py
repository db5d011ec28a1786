#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the oracle SQL from oracle_sql.json in
DuckDB over the same sf dir and compare (columns sorted by name, rows
sorted, exact value equality; floats compared bitwise then with 1e-9 rel
tolerance fallback reported separately)."""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def table_path(sf_dir, t):
    # driver testdata ships single-file tables; ScaleGen dirs hold parts
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple("NULL" if v is None else v for v in r))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b or (math.isnan(a) and math.isnan(b)):
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    # ScaleGen-produced dirs carry events.ts as raw BIGINT nanos (Spark
    # cannot write TIMESTAMP(NANOS)); mirror Tables.events' ns->us floor
    # conversion so the oracle sees the same TIMESTAMP the engine does.
    ts_type = dict((r[0], r[1]) for r in
                   con.sql("DESCRIBE events").fetchall()).get("ts")
    if ts_type == "BIGINT":
        con.execute("""CREATE OR REPLACE VIEW events AS
            SELECT event_id,
                   make_timestamp(CAST((ts - ((ts % 1000) + 1000) % 1000) // 1000
                                  AS BIGINT)) AS ts,
                   user_id, event_type, value, props
            FROM '{}'""".format(table_path(sf_dir, "events")))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = norm(con.sql(
                f"SELECT {', '.join(spark_cols)} FROM spark_rel").fetchall())
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = norm(con.sql(
                f"SELECT {', '.join(duck_cols)} FROM duck_rel").fetchall())
        except Exception as e:
            print(f"FAIL {name}: ERROR {str(e)[:200]}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        # Column-type parity: the driver's hash is type-sensitive (a DuckDB
        # HUGEINT sum vs Spark's BIGINT hash-mismatches even when the values
        # are equal), but fetchall() coerces both to Python int and hides
        # it. Compare declared types, name-aligned, before values.
        spark_types = {c: str(t) for c, t in zip(spark_rel.columns, spark_rel.types)}
        duck_types = {c: str(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
        type_mismatch = {c: (spark_types[c], duck_types[c])
                         for c in spark_cols if spark_types[c] != duck_types[c]}
        if type_mismatch:
            print(f"FAIL {name}: types {type_mismatch}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1
            continue
        exact = spark_rows == duck_rows
        if exact:
            print(f"PASS {name} ({len(spark_rows)} rows, exact)")
            n_pass += 1
            continue
        # Re-sort with floats rounded to 9 significant digits before
        # comparing: a last-ulp float difference can change the raw string
        # sort key and misalign a positional zip, which would report a
        # bogus hard mismatch instead of a float-eps NEAR.
        def blur(rows):
            out = []
            for r in rows:
                out.append(tuple(f"{v:.9g}" if isinstance(v, float) else v
                                 for v in r))
            return sorted(out, key=lambda t: tuple(str(x) for x in t))
        if blur(spark_rows) == blur(duck_rows):
            print(f"NEAR {name} ({len(spark_rows)} rows, float-eps diffs only)")
            n_fail += 1  # driver hashes exactly -> still a fail
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            if a != b and not all(approx_eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad is None:
            print(f"NEAR {name} ({len(spark_rows)} rows, float-eps diffs)")
        else:
            print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
