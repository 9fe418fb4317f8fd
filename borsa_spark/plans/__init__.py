from borsa_spark.plans.intervals import (
    ResamplePlan,
    choose_effective_interval,
    interval_minutes,
    interval_seconds,
)
from borsa_spark.plans.routing_policy import (
    INF,
    ProviderPolicy,
    RoutingContext,
    RoutingPolicy,
    Selector,
)

__all__ = [
    "INF",
    "ProviderPolicy",
    "ResamplePlan",
    "RoutingContext",
    "RoutingPolicy",
    "Selector",
    "choose_effective_interval",
    "interval_minutes",
    "interval_seconds",
]
