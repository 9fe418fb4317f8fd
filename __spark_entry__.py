"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query: the full borsa history pipeline
  (monotonic gate -> daily resample -> priority merge -> attribution flags)
  over the sf0.001 events feed.
- ``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
  SURVEY.md §2, declared in borsa_spark.queries with a DuckDB oracle each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full history router over a 3-provider events-derived
    catalog — planning (largest-divisor interval pushdown), per-provider
    scans, daily resample, adjustedness filter, first-wins priority merge,
    currency validation, attribution — one declarative Spark program."""
    from borsa_spark.queries import _event_catalog
    from borsa_spark.router import ALL_SYMBOLS, HistoryRequest, history

    cat = _event_catalog(spark, SF0001)
    res = history(
        spark,
        cat,
        HistoryRequest(symbol=ALL_SYMBOLS, interval="1d"),
        symbols=ALL_SYMBOLS,  # full-catalog scan, no driver-side symbol list
        validate_currency=True,
    )
    return res.candles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from borsa_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from borsa_spark.queries import ORACLES

    return dict(ORACLES)
