"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in :mod:`topn_spark.queries` (SURVEY.md §2.5 catalog
+ LLM-pipeline extensions); this module just adapts that registry to
the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from topn_spark.queries import QUERIES  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> None:
    """Pin the session contract on a driver-provided session.

    These are runtime-settable SQL confs (the events table is
    unreadable without nanosAsLong; timestamps need UTC).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's own operator: global top-10 orders
    by o_totalprice (TopN.java:98-130 semantics, planned as
    TakeOrderedAndProject).
    """
    _configure(spark)
    return QUERIES["q01"].builder(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(q):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return q.builder(spark, sf_dir)

        run.__name__ = q.name
        run.__doc__ = q.doc
        return run

    return {name: wrap(q) for name, q in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each hash-matchable query."""
    return {
        name: q.oracle
        for name, q in sorted(QUERIES.items())
        if q.oracle is not None
    }
