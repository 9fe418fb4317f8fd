"""borsa_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of borsaorg/borsa.

Everything here is built Spark-first: DataFrame/SQL declarative plans that
Catalyst optimizes, Structured Streaming for streams, Pandas UDFs only where
built-in operators genuinely cannot express the semantics.

Layout
------
- ``schemas``     explicit StructTypes for every table (no inference)
- ``session``     tuned SparkSession builder (AQE, UTC, Arrow)
- ``operators``   stateless DataFrame transforms: resample, merge, infer,
                  attribution, monotonic gate, validation
- ``plans``       pure-Python planning: routing policy, interval planning
- ``router``      capability routers (history, quotes, search, info, ...)
- ``sources``     provider/fixture table registry
- ``functions``   dedup / similarity / text-analysis / multimodal pipelines
- ``streaming``   stream fan-in, monotonic gate, windowed candles, supervisor
- ``middleware``  TTL cache / quota / blacklist wrappers
"""

from borsa_spark.errors import (
    AllProvidersFailed,
    BorsaSparkError,
    CurrencyError,
    NotFoundError,
    UnsupportedError,
)

__version__ = "0.1.0"

__all__ = [
    "AllProvidersFailed",
    "BorsaSparkError",
    "CurrencyError",
    "NotFoundError",
    "UnsupportedError",
    "__version__",
]
