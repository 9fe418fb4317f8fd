"""Currency invariant + blame tests — port of
borsa-core/tests/currency_invariants.rs and history.rs:223-274 blame rules."""

from __future__ import annotations

import pytest

from borsa_spark.errors import CurrencyError
from borsa_spark.operators import (
    check_series_currency_uniform,
    identify_faulty_provider,
)

from .conftest import candle, make_candles

PRIO = {"provA": 0, "provB": 1, "provC": 2}


def test_uniform_passes(spark):
    df = make_candles(
        spark,
        [candle(sec=0, currency="USD"), candle(sec=60, currency="USD", seq=1)],
    )
    check_series_currency_uniform(df)  # no raise


def test_mixed_currency_raises(spark):
    df = make_candles(
        spark,
        [candle(sec=0, currency="USD"), candle(sec=60, currency="EUR", seq=1)],
    )
    with pytest.raises(CurrencyError):
        check_series_currency_uniform(df)


def test_blame_internally_inconsistent_provider(spark):
    df = make_candles(
        spark,
        [
            candle(provider="provA", sec=0, currency="USD"),
            candle(provider="provB", sec=60, currency="USD", seq=0),
            candle(provider="provB", sec=120, currency="EUR", seq=1),
        ],
    )
    assert identify_faulty_provider(df, PRIO) == "provB"


def test_blame_deviating_provider(spark):
    # every provider internally consistent; the one differing from the
    # highest-priority consistent currency is blamed.
    df = make_candles(
        spark,
        [
            candle(provider="provA", sec=0, currency="USD"),
            candle(provider="provB", sec=60, currency="EUR", seq=0),
        ],
    )
    assert identify_faulty_provider(df, PRIO) == "provB"
