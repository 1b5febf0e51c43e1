"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 registers a (PySpark callable,
DuckDB oracle SQL) pair here; ``__spark_entry__.py`` re-exports them. Import
order groups the inventory: reference core → relational surface → scale
extensions (dedup / similarity / text / multimodal).
"""

from .registry import ORACLES, QUERIES, register

from . import reference  # noqa: E402,F401  (registration side effects)
from . import relational  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
