"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``deduplicate_spark.entry_queries``; this module is
the thin contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deduplicate_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full near-duplicate detection + clustering + canonical
    resolution over the sf0.001 documents corpus (as single-turn
    transcripts). Returns the actions table."""
    return entry_queries.q_dd_actions(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return entry_queries.queries()


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
