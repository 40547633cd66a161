#!/usr/bin/env python3
"""Synthesize the ~sf1 scale-probe corpus from sf0.1 (driver-side duckdb
tooling, not library code) — the recipe documented in BASELINE.md round 9:

- lineitem x10: per-replica orderkey offsets and partkey namespaces, with
  ~2% of parts kept in a SHARED hub namespace so the co-order graph stays
  one giant connected component instead of 10 disjoint copies.
- documents x10: per-replica token suffixes => disjoint shingle spaces
  (dup-rate and max-df invariant while the corpus grows 10x).
- embeddings x10: per-replica component rotation (within-replica geometry
  preserved, cross-replica decorrelated).
- orders x10 (round 11): per-replica orderkey offsets on the SAME base as
  lineitem, so the lineitem<->orders FK stays aligned in every replica.
- events x10 (round 11): per-replica event-id and user-id namespaces --
  10x more user series with identical per-series temporal shape.
- true dimension tables copied unchanged.

Usage: python3 tools/make_sf1.py [/root/testdata/sf0.1] [/tmp/sf1]
"""
import shutil
import sys
from pathlib import Path

import duckdb

REPLICAS = 10


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({REPLICAS})) AS k")

    ok_base = con.execute(f"""
      SELECT greatest(
        (SELECT max(l_orderkey) FROM '{src}/lineitem.parquet'),
        (SELECT max(o_orderkey) FROM '{src}/orders.parquet')) + 1""").fetchone()[0]
    con.execute(f"""
      COPY (
        SELECT li.* REPLACE (
          l_orderkey + k * {ok_base} AS l_orderkey,
          CASE WHEN l_partkey % 50 = 0 THEN l_partkey
               ELSE l_partkey + k * (SELECT max(l_partkey) + 1 FROM '{src}/lineitem.parquet')
          END AS l_partkey)
        FROM '{src}/lineitem.parquet' li CROSS JOIN reps
      ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
    print("lineitem x%d" % REPLICAS)

    con.execute(f"""
      COPY (
        SELECT o.* REPLACE (o_orderkey + k * {ok_base} AS o_orderkey)
        FROM '{src}/orders.parquet' o CROSS JOIN reps
      ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    print("orders x%d" % REPLICAS)

    con.execute(f"""
      COPY (
        SELECT e.* REPLACE (
          event_id + k * (SELECT max(event_id) + 1 FROM '{src}/events.parquet') AS event_id,
          user_id + k * (SELECT max(user_id) + 1 FROM '{src}/events.parquet') AS user_id)
        FROM '{src}/events.parquet' e CROSS JOIN reps
      ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    print("events x%d" % REPLICAS)

    con.execute(f"""
      COPY (
        SELECT d.* REPLACE (
          doc_id + k * (SELECT max(doc_id) + 1 FROM '{src}/documents.parquet') AS doc_id,
          CASE WHEN k = 0 THEN text
               ELSE regexp_replace(text, '(\\S+)', '\\1_r' || k, 'g')
          END AS text)
        FROM '{src}/documents.parquet' d CROSS JOIN reps
      ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    print("documents x%d" % REPLICAS)

    dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1").fetchone()[0]
    con.execute(f"""
      COPY (
        SELECT e.* REPLACE (
          vec_id + k * (SELECT max(vec_id) + 1 FROM '{src}/embeddings.parquet') AS vec_id,
          CAST(list_concat(embedding[k + 1:{dim}], embedding[1:k])
               AS FLOAT[]) AS embedding)
        FROM '{src}/embeddings.parquet' e CROSS JOIN reps
      ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    print("embeddings x%d" % REPLICAS)

    for name in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(src / f"{name}.parquet", dst / f"{name}.parquet")
    print("dimension/other tables copied")


if __name__ == "__main__":
    main()
