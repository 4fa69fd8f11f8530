"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose every implemented Op-ID from
SURVEY.md §2 via the central registry
(``cs_pipeline_spark/registry.py``). Op-IDs with no oracle entry are
non-SQL-expressible ops (driver records a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's headline workload end-to-end:
    scan → CO₂/WTD enrichment joins → bbox clip → predictor
    projection → AGG_SCHEMA daily resample (core.py:170-257).
    """
    from cs_pipeline_spark.operators.pipeline_e2e import process_area

    return process_area(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cs_pipeline_spark import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from cs_pipeline_spark import registry

    return registry.oracles()
