"""Compatibility shim: the market-analytics registry was split in
round 11 into three sibling modules (mechanical, zero behavior change):

- :mod:`.market_series` — series tier (MAs, momentum, EWMA/MACD/RSI, ...)
- :mod:`.market_bars`   — volume/daily-bar indicator tier (OBV, ATR, ...)
- :mod:`.market_stats`  — risk/microstructure/statistics tier

Importing this module (as plans/__init__ does) registers all three in
the ORIGINAL registration order; public helpers are re-exported here for
backward compatibility.
"""

from . import market_series  # noqa: F401  (registration order matters)
from . import market_bars  # noqa: F401
from . import market_stats  # noqa: F401
from .market_series import ewma_blocked  # noqa: F401
