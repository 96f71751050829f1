from .scalars import (
    composite_relevance,
    humanize_number,
    pct_change,
    relative_time,
    time_decay,
)

__all__ = [
    "pct_change",
    "time_decay",
    "composite_relevance",
    "humanize_number",
    "relative_time",
]
