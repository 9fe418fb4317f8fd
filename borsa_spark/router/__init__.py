from borsa_spark.router.history import (
    ALL_SYMBOLS,
    HistoryRequest,
    HistoryResult,
    history,
    plan_history,
)
from borsa_spark.router.info import download, fast_info, info
from borsa_spark.router.quotes import quote, quote_or_raise, quotes
from borsa_spark.router.search import search
from borsa_spark.router.stream import (
    StreamHandle,
    stream_candles,
    stream_options,
    stream_quotes,
    stream_updates,
)
from borsa_spark.router.tables import capability_scan

__all__ = [
    "ALL_SYMBOLS",
    "HistoryRequest",
    "HistoryResult",
    "capability_scan",
    "download",
    "fast_info",
    "history",
    "info",
    "plan_history",
    "quote",
    "quote_or_raise",
    "quotes",
    "search",
    "stream_candles",
    "stream_options",
    "stream_quotes",
    "stream_updates",
    "StreamHandle",
]
