from borsa_spark.sources.rest import (
    FakeTransport,
    RestAdapter,
    UrllibTransport,
    map_http_error,
    rest_source,
    socket_quote_stream,
    stream_source,
)
from borsa_spark.sources.tables import TABLES, load_table, register_views

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "FakeTransport",
    "RestAdapter",
    "UrllibTransport",
    "map_http_error",
    "rest_source",
    "socket_quote_stream",
    "stream_source",
]
