"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship spatial-join + tiling query on sf0.001.
queries()      — name → callable(spark, sf_dir) -> DataFrame, one per
                 implemented operator (see gdal_spark/queries.py).
oracle_sql()   — matching DuckDB SQL for the driver's correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gdal_spark import queries as Q  # noqa: E402


def _ship_package(spark: SparkSession) -> None:
    """Make gdal_spark importable on executors (py-files equivalent)."""
    try:
        from gdal_spark.session import _package_zip
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added, or session forbids it — workers may have it anyway


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: PIP join (ray-cast, broadcast prepared polygons)
    + WebMercator tile assignment, aggregated per (admin cell, z8 tile)."""
    _ship_package(spark)
    return Q.q_pip_tile_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _oracle) in Q.QUERIES.items():
        def wrapped(spark, sf_dir, _fn=fn):
            _ship_package(spark)
            return _fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {name: oracle for name, (_fn, oracle) in Q.QUERIES.items()
            if oracle is not None}
