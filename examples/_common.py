"""Shared fixture catalog for the numbered examples — the analog of the
reference's ``examples/common/mod.rs`` mock connector (``get_connector()``,
reference: borsa/examples/common/mod.rs:6-45).

The reference's examples hit either a live connector or, in CI, a static
mock with canned fixtures. Here every table is derived DETERMINISTICALLY
from the driver-generated events parquet (never synthesized row lists), so
each example demonstrates real router plans over real columnar input:

    symbol   := event_type            (5 distinct symbols)
    price    := value                 (per-event price ticks)
    provider := "mock" (single-provider catalog, like MockConnector), or
                per-example fast/slow fixtures for the routing demos.

``get_catalog(spark)`` returns a one-provider catalog covering every table
capability the router exposes (the MockConnector analog). Examples that
need multiple providers (per-symbol priority, merge strategies) build their
own two-provider catalogs inline, as the reference examples define bespoke
connectors inline.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from borsa_spark import schemas  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"

#: the five event_type values double as the example symbol universe
SYMBOLS = ["click", "error", "purchase", "signup", "view"]


def _sym() -> F.Column:
    return F.col("event_type").alias("symbol")


def latest_quote_table(ev: DataFrame, provider: str = "mock") -> DataFrame:
    """Latest tick per symbol as the provider's quote table."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.lit(provider).alias("provider"), _sym(),
            F.lit("EQUITY").alias("kind"),
            F.col("value").cast(schemas.MONEY).alias("price"),
            (F.col("value") * 0.99).cast(schemas.MONEY)
             .alias("previous_close"),
            F.lit("USD").alias("currency"),
            F.lit("NASDAQ").alias("exchange"),
            F.col("user_id").cast("long").alias("day_volume"),
        )
    )


def history_table(ev: DataFrame, provider: str = "mock") -> DataFrame:
    """Per-event candles in the history-router shape (native 1m)."""
    px = F.col("value").cast("decimal(38,9)")
    return ev.select(
        F.lit(provider).alias("provider"), _sym(),
        F.lit("EQUITY").alias("kind"), F.col("ts"),
        px.alias("open"), px.alias("high"), px.alias("low"), px.alias("close"),
        F.lit(None).cast("decimal(38,9)").alias("close_unadj"),
        F.lit(1).cast("long").alias("volume"),
        F.lit("USD").alias("currency"), F.lit(True).alias("adjusted"),
        F.lit(None).cast("string").alias("timezone"),
        F.lit(None).cast("long").alias("utc_offset_seconds"),
        F.col("event_id").alias("seq"), F.lit("1m").alias("interval"),
    )


def get_catalog(spark) -> Catalog:
    """The MockConnector analog: one provider, every table capability."""
    ev = load_table(spark, SF, "events")
    sym = _sym()
    prov = F.lit("mock").alias("provider")

    quote = latest_quote_table(ev)
    hist = history_table(ev)

    per_sym = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 2).alias("px"),
        F.count("*").cast("long").alias("n_events"),
        F.max("ts").alias("last_ts"),
    )
    base = per_sym.select(
        prov, F.col("event_type").alias("symbol"), "px", "n_events", "last_ts"
    )

    search = base.select(
        "provider", "symbol",
        F.concat(F.upper(F.col("symbol")), F.lit(" Corp.")).alias("name"),
        F.lit("NASDAQ").alias("exchange"), F.lit("EQUITY").alias("kind"),
        F.lit(0).cast("int").alias("result_idx"),
    )
    price_target = base.select(
        "provider", "symbol",
        (F.col("px") * 0.8).cast(schemas.MONEY).alias("low"),
        (F.col("px") * 1.1).cast(schemas.MONEY).alias("mean"),
        (F.col("px") * 1.5).cast(schemas.MONEY).alias("high"),
        (F.col("n_events") % 30 + 3).cast("int").alias("number_of_analysts"),
    )
    recommendations = base.select(
        "provider", "symbol",
        F.date_format("last_ts", "yyyy-MM").alias("period"),
        (F.col("n_events") % 7).cast("int").alias("strong_buy"),
        (F.col("n_events") % 11).cast("int").alias("buy"),
        (F.col("n_events") % 13).cast("int").alias("hold"),
        (F.col("n_events") % 5).cast("int").alias("sell"),
        (F.col("n_events") % 3).cast("int").alias("strong_sell"),
    )
    recommendations_summary = base.select(
        "provider", "symbol",
        F.round(1.0 + (F.col("n_events") % 40) / 10.0, 2).alias("mean_rating"),
        (F.col("n_events") % 30 + 3).cast("int").alias("n_analysts"),
    )
    upgrades = ev.filter(F.col("event_id") % 97 == 0).select(
        prov, sym, F.col("ts"),
        F.concat(F.lit("Firm-"), (F.col("user_id") % 5).cast("string"))
         .alias("firm"),
        F.when(F.col("event_id") % 2 == 0, "up").otherwise("down")
         .alias("action"),
        F.when(F.col("event_id") % 2 == 0, "Hold").otherwise("Buy")
         .alias("from_grade"),
        F.when(F.col("event_id") % 2 == 0, "Buy").otherwise("Hold")
         .alias("to_grade"),
    )
    calendar = base.select(
        "provider", "symbol",
        F.date_add(F.col("last_ts").cast("date"), 30).alias("earnings_date"),
        F.date_add(F.col("last_ts").cast("date"), 10)
         .alias("ex_dividend_date"),
    )

    def stmt(quarterly: bool) -> DataFrame:
        trunc = "quarter" if quarterly else "year"
        return ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc(trunc, F.col("ts")).alias("period"),
        ).agg(
            F.round(F.sum("value"), 2).alias("revenue"),
            F.round(F.sum("value") * 0.21, 2).alias("net_income"),
            F.round(F.sum("value") * 1.7, 2).alias("total_assets"),
            F.round(F.sum("value") * 0.6, 2).alias("total_debt"),
            F.round(F.sum("value") * 0.35, 2).alias("operating_cashflow"),
            F.round(F.sum("value") * 0.15, 2).alias("free_cashflow"),
        ).select(
            prov, "*", F.lit(quarterly).alias("quarterly"),
        )

    statements = stmt(True).unionByName(stmt(False))
    earnings = ev.groupBy(
        F.col("event_type").alias("symbol"),
        F.date_trunc("quarter", F.col("ts")).alias("period"),
    ).agg(
        F.round(F.avg("value") / 100, 4).alias("eps_actual"),
        F.round(F.avg("value") / 105, 4).alias("eps_estimate"),
    ).select(prov, "*")

    major_holders = base.select(
        "provider", "symbol",
        F.round((F.col("n_events") % 40) / 100.0 + 0.01, 4)
         .alias("insiders_pct"),
        F.round((F.col("n_events") % 55) / 100.0 + 0.30, 4)
         .alias("institutions_pct"),
    )
    inst_holders = ev.filter(F.col("event_id") % 53 == 0).select(
        prov, sym,
        F.concat(F.lit("Fund-"), (F.col("user_id") % 8).cast("string"))
         .alias("holder"),
        (F.col("user_id") * 1000).cast("long").alias("shares"),
        F.col("ts").cast("date").alias("report_date"),
    )
    mf_holders = inst_holders.withColumn(
        "holder", F.concat(F.lit("MF-"), F.col("holder"))
    )
    insider_tx = ev.filter(F.col("event_id") % 71 == 0).select(
        prov, sym,
        F.concat(F.lit("Officer-"), (F.col("user_id") % 6).cast("string"))
         .alias("insider"),
        F.when(F.col("event_id") % 2 == 0, "Buy").otherwise("Sale")
         .alias("transaction"),
        (F.col("user_id") * 10).cast("long").alias("shares"),
        F.col("ts"),
    )
    insider_roster = insider_tx.groupBy("provider", "symbol", "insider").agg(
        F.sum("shares").cast("long").alias("shares_owned"),
        F.max("ts").alias("latest_transaction"),
    )
    net_share_purchase = insider_tx.groupBy("provider", "symbol").agg(
        F.sum(
            F.when(F.col("transaction") == "Buy", F.col("shares"))
             .otherwise(-F.col("shares"))
        ).cast("long").alias("net_shares"),
        F.count("*").cast("int").alias("n_transactions"),
    )
    news = ev.filter(F.col("event_id") % 41 == 0).select(
        prov, sym, F.col("ts"),
        F.concat(F.lit("Story about "), F.col("event_type"), F.lit(" #"),
                 F.col("event_id").cast("string")).alias("title"),
        F.concat(F.lit("Publisher-"), (F.col("user_id") % 4).cast("string"))
         .alias("publisher"),
        F.when(F.col("event_id") % 3 == 0, "press_releases")
         .otherwise("news").alias("tab"),
    )
    esg = base.select(
        "provider", "symbol",
        F.round(10.0 + (F.col("n_events") % 300) / 10.0, 2).alias("total_esg"),
        F.round((F.col("n_events") % 100) / 10.0, 2).alias("environment"),
        F.round((F.col("n_events") % 110) / 10.0, 2).alias("social"),
        F.round((F.col("n_events") % 120) / 10.0, 2).alias("governance"),
    )
    profile = base.select(
        "provider", "symbol",
        F.concat(F.upper(F.col("symbol")), F.lit(" Corp.")).alias("name"),
        F.lit("Technology").alias("sector"), "n_events",
    )
    isin = base.select(
        "provider", "symbol",
        F.concat(
            F.lit("US"),
            F.lpad((F.abs(F.xxhash64("symbol")) % 1000000000).cast("string"),
                   9, "0"),
            F.lit("5"),
        ).alias("isin"),
    )

    cat = Catalog()
    cat.register(
        fixture_source(
            "mock",
            history_intervals=("1m",),
            quote=quote,
            history=hist,
            search=search,
            price_target=price_target,
            recommendations=recommendations,
            recommendations_summary=recommendations_summary,
            upgrades_downgrades=upgrades,
            calendar=calendar,
            income_statement=statements,
            balance_sheet=statements,
            cashflow=statements,
            earnings=earnings,
            major_holders=major_holders,
            institutional_holders=inst_holders,
            mutual_fund_holders=mf_holders,
            insider_transactions=insider_tx,
            insider_roster=insider_roster,
            net_share_purchase=net_share_purchase,
            news=news,
            esg=esg,
            profile=profile,
            isin=isin,
        )
    )
    return cat
