from borsa_spark.operators.attribution import build_attribution
from borsa_spark.operators.infer import estimate_step_seconds, is_subdaily
from borsa_spark.operators.merge import dedup_actions, merge_history
from borsa_spark.operators.monotonic import monotonic_gate
from borsa_spark.operators.resample import (
    fill_gaps,
    resample_to_daily,
    resample_to_minutes,
    resample_to_weekly,
)
from borsa_spark.operators.validate import (
    check_series_currency_uniform,
    identify_faulty_provider,
)

__all__ = [
    "build_attribution",
    "check_series_currency_uniform",
    "dedup_actions",
    "estimate_step_seconds",
    "identify_faulty_provider",
    "is_subdaily",
    "merge_history",
    "monotonic_gate",
    "fill_gaps",
    "resample_to_daily",
    "resample_to_minutes",
    "resample_to_weekly",
]
