"""Dump explain('formatted') for catalog entries to files.

Usage: python tools/dump_plan.py <suffix> <query> [query ...]
Writes plans/r14/<query>_<suffix>.txt for each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from topn_spark.plans import formatted_plan
from topn_spark.queries import QUERIES
from topn_spark.session import get_session


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="dump_plan", shuffle_partitions=8)
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print(path)


if __name__ == "__main__":
    main()
