"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship transitive-clustering query at
sf0.001; ``queries()`` exposes every implemented operator from SURVEY.md §2
plus the training-data-pipeline ops; ``oracle_sql()`` gives the DuckDB
equivalent for each SQL-expressible one.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _all_query_modules():
    from webr.queries import (dataops, er_docs, er_pipeline, linkgraph,
                              relational)
    return [relational, er_docs, dataops, linkgraph, er_pipeline]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transitive near-duplicate clustering over documents
    (blocking -> pair scoring -> connected components) at sf0.001."""
    from webr.queries.er_docs import q_doc_components
    return q_doc_components(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _all_query_modules():
        for name, (fn, _sql) in mod.QUERIES.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _all_query_modules():
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
