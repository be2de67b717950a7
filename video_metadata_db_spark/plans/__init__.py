"""Query plans — the driver-checked operator inventory.

Importing this package registers every query (and its DuckDB oracle SQL)
into :mod:`.registry`.  ``__spark_entry__`` exposes them to the driver.
"""

from . import parity_queries  # noqa: F401
from .registry import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]


def _import_all() -> None:
    # imported lazily so a syntax error in one module is easy to localize
    from . import inventory_queries  # noqa: F401
    from . import format_queries  # noqa: F401
    from . import text_queries  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import similarity_queries  # noqa: F401
    from . import streaming_queries  # noqa: F401
    from . import asof_queries  # noqa: F401
    from . import udf_queries  # noqa: F401
    from . import tpch_queries  # noqa: F401
    from . import membership_queries  # noqa: F401


try:
    _import_all()
except ImportError:
    # modules land incrementally during the build; parity queries alone
    # keep the entry contract functional
    pass
