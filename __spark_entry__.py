"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``open_source_search_engine_spark.entry_queries``;
this file only adapts it to the driver's entry-point shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from open_source_search_engine_spark.entry_queries import (  # noqa: E402
    build_registry,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 conjunctive search on sf0.001 through
    the STORED index (build_index -> block-max WAND), the engine's real
    query path."""
    # keep this session usable even if the driver built it without our
    # tuned confs (the ICU case-mapping path hangs on this VM)
    try:
        spark.conf.set("spark.sql.icu.caseMappings.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    from open_source_search_engine_spark.engine_entries import q_engine_bm25_and2

    return q_engine_bm25_and2(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_registry()[0]


def oracle_sql() -> dict[str, str]:
    return build_registry()[1]
