"""Deterministic fixture + scriptable mock sources (borsa-mock parity).

The reference ships a fixture connector with canned per-symbol data
(borsa-mock/src/fixtures/history.rs:4-23, fixtures/quotes.rs:4-50) and a
scriptable dynamic mock whose per-capability behaviors are
Return/Fail/Hang and stream behaviors Success/Fail/Hang/Manual
(borsa-mock/src/dynamic.rs:14-35). This module is the Spark-native
counterpart: the fixture data reproduces the reference values verbatim so
golden expectations line up, and `ScriptedSource` raises, returns, or
hangs per capability under test control (`Hang` simulates the network
stall the R7 timeout machinery must bound, dynamic.rs:25-35).
"""

from __future__ import annotations

import threading
from datetime import datetime
from decimal import Decimal
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from borsa_spark import schemas
from borsa_spark.errors import BorsaSparkError
from borsa_spark.sources.provider import ALL_KINDS, Source

#: fixtures/history.rs:4-23 — (symbol, date, open, high, low, close, volume)
FIXTURE_CANDLES = [
    ("AAPL", "2023-01-02", "140", "142", "139", "141", 10_000_000),
    ("AAPL", "2023-01-03", "141", "143", "140", "142", 11_000_000),
    ("MSFT", "2023-01-02", "240", "245", "238", "244", 9_000_000),
    ("MSFT", "2023-01-03", "244", "246", "243", "245", 9_500_000),
    ("GOOG", "2023-01-02", "100", "110", "95", "105", 5_000_000),
    ("GOOG", "2023-01-03", "105", "112", "102", "110", 5_500_000),
    ("TSLA", "2023-01-02", "300", "310", "295", "305", 8_000_000),
    ("TSLA", "2023-01-03", "305", "315", "300", "312", 8_500_000),
]

#: fixtures/quotes.rs:4-50 — (symbol, kind, name, price, prev_close, exchange)
FIXTURE_QUOTES = [
    ("AAPL", "EQUITY", "Apple Inc.", "190.00", "188.00", "NASDAQ"),
    ("MSFT", "EQUITY", "Microsoft Corp", "420.00", "418.00", "NASDAQ"),
    ("NVDA", "EQUITY", "NVIDIA Corp", "1000.00", "990.00", "NASDAQ"),
    ("GOOGL", "EQUITY", "Alphabet Inc. Class A", "150.00", "148.00", "NASDAQ"),
    ("KO", "EQUITY", "Coca-Cola", "60.00", "59.50", "NYSE"),
    ("PEP", "EQUITY", "PepsiCo", "170.00", "168.00", "NASDAQ"),
    ("BTC-USD", "CRYPTO", "Bitcoin USD", "65000.00", "64000.00", None),
]


def fixture_history_df(spark: SparkSession, provider: str = "mock") -> DataFrame:
    rows = []
    for i, (sym, date, o, h, low, c, v) in enumerate(FIXTURE_CANDLES):
        ts = datetime.strptime(date, "%Y-%m-%d")
        rows.append(
            (provider, sym, "EQUITY", ts, Decimal(o), Decimal(h), Decimal(low),
             Decimal(c), None, v, "USD", False, None, None, i)
        )
    return spark.createDataFrame(rows, schema=schemas.CANDLES)


def fixture_quotes_df(spark: SparkSession, provider: str = "mock") -> DataFrame:
    rows = [
        (provider, sym, kind, name, Decimal(px), Decimal(prev), "USD",
         exch, None, None)
        for sym, kind, name, px, prev, exch in FIXTURE_QUOTES
    ]
    return spark.createDataFrame(rows, schema=schemas.QUOTES)


def fixture_mock_source(spark: SparkSession, name: str = "mock") -> Source:
    """The borsa-mock fixture connector: canned history + quotes, 1d native."""
    return Source(
        name=name,
        kinds=ALL_KINDS,
        history_intervals=("1d",),
        tables={
            "history": fixture_history_df(spark, name),
            "quote": fixture_quotes_df(spark, name),
        },
    )


class Hang:
    """dynamic.rs:25-35: simulate a network stall during the provider call.

    The stall is finite (``seconds``) so abandoned worker threads drain
    after the timeout wrapper gives up on them; ``release()`` (or the
    shared Event) ends it early. If the stall elapses *without* a timeout
    wrapper having abandoned the call, the behavior raises — a hang that
    "succeeds" means the test forgot the timeout."""

    def __init__(self, seconds: float = 30.0):
        self.seconds = seconds
        self.released = threading.Event()

    def release(self) -> None:
        self.released.set()

    def __call__(self) -> None:
        self.released.wait(self.seconds)
        raise RuntimeError(
            "Hang elapsed without being timed out — wrap the provider call "
            "in provider_call_with_timeout"
        )


class ScriptedSource(Source):
    """Scriptable mock: per-capability behavior Return(df) | Fail(error) |
    Hang (dynamic.rs:14-22). Behaviors can be swapped between calls to
    script failover / recovery scenarios; every table access is recorded."""

    def __init__(self, name: str, kinds=None, history_intervals=("1d",)):
        super().__init__(
            name=name,
            kinds=frozenset(kinds) if kinds else ALL_KINDS,
            history_intervals=tuple(history_intervals),
            tables={},
        )
        self.behaviors: dict[str, DataFrame | BorsaSparkError | Callable] = {}
        self.calls: list[str] = []

    def script(self, capability: str,
               behavior: DataFrame | BorsaSparkError | Callable) -> "ScriptedSource":
        self.behaviors[capability] = behavior
        self.tables[capability] = object()  # advertises the capability
        return self

    def table(self, capability: str) -> DataFrame:
        from pyspark.sql import functions as F

        self.calls.append(capability)
        b = self.behaviors.get(capability)
        if b is None:
            return super().table(capability)
        if isinstance(b, BorsaSparkError):
            raise b
        df = b() if callable(b) else b  # Hang blocks here until released
        if "provider" not in df.columns:
            df = df.withColumn("provider", F.lit(self.name))
        return df
