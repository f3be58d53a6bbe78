"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (FK-propagated subsetting +
native-expression anonymization) on sf0.001. ``queries()`` exposes every
implemented operator from SURVEY.md §2 plus the training-data-pipeline
extensions; ``oracle_sql()`` returns the DuckDB-equivalent SQL for each —
both registries live in the package and are built from the same frozen
data lists, so they cannot drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from simple_anonymizer_spark.oracle.queries import ORACLES  # noqa: E402
from simple_anonymizer_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: anonymized, FK-subsetted customer copy at sf0.001."""
    return QUERIES["spec_subset_region"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
