"""Build a scaled-up copy of the test data for scaling smoke runs.

Replicates every table N times with all key/id columns offset by
``copy_idx * OFFSET`` — foreign-key relationships stay consistent
within each copy (customer copy i joins orders copy i), so every
catalog query is semantically meaningful at the larger scale. Text
and embedding payloads are left identical across copies, which makes
the scaled corpus duplicate-heavy — a deliberate stress of the
near-dup operators' quadratic-blowup guards.

Usage: python tools/make_scale_data.py [src_sf_dir] [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from topn_spark.catalog import TABLES, load_table
from topn_spark.session import get_session

OFFSET = 10_000_000

#: id/key columns to shift, per table (foreign keys included so each
#: copy is a self-consistent universe).
KEY_COLS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_session(app_name="make_scale_data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, src, t)
        parts = []
        for i in range(copies):
            p = df
            for c in KEY_COLS[t]:
                p = p.withColumn(c, F.col(c) + F.lit(i * OFFSET))
            parts.append(p)
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.union(p)
        # events.ts arrives as bigint nanos via the shim's source; the
        # shim already rebuilt it to timestamp in load_table, so write
        # as-is — bench re-reads through load_table, which detects the
        # already-typed column.
        scaled.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(t, scaled.count())


if __name__ == "__main__":
    main()
