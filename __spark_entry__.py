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

_SHIPPED: set[str] = set()


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Python workers unpickle pandas-UDF closures by importing this
    package; the driver's session may not carry /root/repo on the workers'
    PYTHONPATH, so ship the package archive via addPyFile once per app."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    import shutil
    import tempfile

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "simple_anonymizer_spark")
    zip_base = os.path.join(tempfile.mkdtemp(prefix="saspark-"), "simple_anonymizer_spark")
    archive = shutil.make_archive(zip_base, "zip",
                                  root_dir=os.path.dirname(pkg_dir),
                                  base_dir="simple_anonymizer_spark")
    spark.sparkContext.addPyFile(archive)
    _SHIPPED.add(app_id)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: anonymized, FK-subsetted customer copy at sf0.001."""
    _ensure_package_shipped(spark)
    return QUERIES["spec_subset_region"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_package_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
