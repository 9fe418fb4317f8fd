"""23 — DataFrame sink: fetch a quote and hand it over as a DataFrame
(reference: borsa/examples/23_dataframe.rs).

The reference needs a `dataframe` feature flag and a ToDataFrame trait
to turn structs into a polars frame. Here every router result IS a Spark
DataFrame already (S13 is native); this example shows the handoff
surfaces a downstream pipeline would use: schema, shape, Arrow-backed
pandas export.

Run: python examples/23_dataframe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import get_catalog  # noqa: E402

from borsa_spark.router import quote  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ex23_dataframe")
    cat = get_catalog(spark)

    df = quote(spark, cat, "click")
    print("Result is a DataFrame; schema:")
    df.printSchema()

    pdf = df.toPandas()  # Arrow-batched export for local analysis
    print(f"DataFrame shape: {pdf.shape[0]} rows x {pdf.shape[1]} cols")
    spark.stop()


if __name__ == "__main__":
    main()
