from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import SparkSession

from borsa_spark import schemas


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = (
        SparkSession.builder.master("local[4]")
        .appName("borsa_spark_tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def ts(sec: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(sec, tz=dt.timezone.utc).replace(tzinfo=None)


def candle(
    provider="provA",
    symbol="AAPL",
    sec=0,
    o=1.0,
    h=None,
    l=None,  # noqa: E741
    c=None,
    close_unadj=None,
    volume=None,
    currency="USD",
    adjusted=True,
    timezone=None,
    utc_offset_seconds=None,
    seq=0,
    kind="EQUITY",
):
    h = o if h is None else h
    l = o if l is None else l  # noqa: E741
    c = o if c is None else c

    def d(x):
        return None if x is None else Decimal(str(x))

    return (
        provider, symbol, kind, ts(sec), d(o), d(h), d(l), d(c),
        d(close_unadj), volume, currency, adjusted, timezone,
        utc_offset_seconds, seq,
    )


def make_candles(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.CANDLES)


def action(provider="provA", symbol="AAPL", sec=0, kind="dividend",
           amount=1.0, currency="USD", numerator=None, denominator=None):
    amt = None if amount is None else Decimal(str(amount))
    return (provider, symbol, ts(sec), kind, amt, currency, numerator, denominator)


def make_actions(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.ACTIONS)
