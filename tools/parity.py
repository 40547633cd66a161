#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json + each <verifyOutDir>/<name>/ parquet
(written by `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"`), runs the
oracle SQL in DuckDB with every testdata table registered as a view, and
compares: column names (sorted), row count, and cell values (row order as
produced; columns compared sorted by name). Floats are compared exactly AND
with 1e-9 relative tolerance so near-misses are visible.

Driver-side tooling only — the Scala library never depends on this.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def hash_class(t, duck_side=False):
    """Collapse an arrow type to the value class the driver's hash sees.
    Calibrated against the r4 driver verdicts: int32 vs int64 PASSED,
    DuckDB decimal128(26,1) vs Spark double PASSED, but DuckDB HUGEINT
    (decimal128(38,0), from an un-cast integer sum()) vs Spark int64
    FAILED — consistent with the driver coercing DuckDB DECIMAL/HUGEINT
    columns to float (pandas-style), so a duck decimal against a Spark
    integer is the failing combination. duck_side=True applies that
    decimal→float coercion; the Spark side keeps decimal distinct so any
    accidental un-cast Spark decimal output is flagged too."""
    if duck_side and pa.types.is_decimal(t):
        return "float"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", hash_class(t.value_type, duck_side))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, hash_class(f.type, duck_side)) for f in t))
    return str(t)


def load_spark(out_dir: Path, name: str):
    ds = out_dir / name
    files = sorted(ds.glob("*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0]) if len(files) == 1 else pq.read_table(ds)


def main():
    sf_dir, out_dir = Path(sys.argv[1]), Path(sys.argv[2])
    only = set(sys.argv[3:])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_tbl = load_spark(out_dir, name)
        if spark_tbl is None:
            print(f"[FAIL] {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {e}")
            n_fail += 1
            continue

        s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"[FAIL] {name}: columns spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"[FAIL] {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}")
            n_fail += 1
            continue

        # Type-exactness: the driver hashes value ENCODINGS, so e.g. DuckDB's
        # HUGEINT/decimal128 sum() vs Spark's int64 hash-mismatches even when
        # to_pylist() values compare equal. Compare the hash CLASS per column
        # (not the exact arrow type — int32 vs int64 is proven-equal under
        # the driver's hash) so local parity predicts the driver's verdict.
        type_diff = []
        for c in s_cols:
            st = spark_tbl.schema.field(c).type
            dt = duck.schema.field(c).type
            if hash_class(st) != hash_class(dt, duck_side=True):
                type_diff.append((c, st, dt))
        if type_diff:
            c, st, dt = type_diff[0]
            more = f" (+{len(type_diff) - 1} more)" if len(type_diff) > 1 else ""
            print(f"[FAIL] {name}: type mismatch col={c} spark={st} duck={dt}{more}")
            n_fail += 1
            continue

        exact = True
        close = True
        first_diff = None
        for c in s_cols:
            sv = spark_tbl.column(c).to_pylist()
            dv = duck.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if a == b or (a is None and b is None):
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    if math.isnan(a) and math.isnan(b):
                        continue
                    exact = False
                    if not math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
                        close = False
                        first_diff = first_diff or (c, i, a, b)
                else:
                    exact = close = False
                    first_diff = first_diff or (c, i, a, b)
            if not close:
                break
        if exact:
            print(f"[PASS] {name}: exact ({spark_tbl.num_rows} rows)")
            n_pass += 1
        elif close:
            print(f"[WARN→PASS?] {name}: float-close but NOT bit-exact ({spark_tbl.num_rows} rows) — hash compare would fail")
            n_fail += 1
        else:
            c, i, a, b = first_diff
            print(f"[FAIL] {name}: first diff col={c} row={i} spark={a!r} duck={b!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail / {n_pass + n_fail} checked")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
