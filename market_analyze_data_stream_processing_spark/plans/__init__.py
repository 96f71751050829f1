"""Oracle-checked query registry — the driver contract surface.

Each module registers named queries with ``register``; ``__spark_entry__``
exposes them via ``queries()`` / ``oracle_sql()``.
"""

from .registry import QUERIES, register  # noqa: F401

# Import for registration side effects.
from . import relational  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import market  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import vectors  # noqa: E402,F401
from . import advanced  # noqa: E402,F401
from . import media  # noqa: E402,F401

__all__ = ["QUERIES", "register"]
