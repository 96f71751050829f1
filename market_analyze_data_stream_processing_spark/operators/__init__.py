from .analytics import (
    daily_summary,
    keep_last,
    latest_per_key,
    with_lag_variation,
    with_momentum_lags,
    with_moving_averages,
    with_trend,
)

__all__ = [
    "with_moving_averages",
    "with_lag_variation",
    "with_momentum_lags",
    "with_trend",
    "daily_summary",
    "latest_per_key",
    "keep_last",
]
