"""Registry mapping query names → (Spark plan builder, DuckDB oracle SQL).

The driver contract (__spark_entry__.py) runs each builder at sf0.01 and
hash-compares against the oracle SQL; builders therefore alias every
computed column to the same name the SQL uses, and cast output numerics
to explicit DOUBLE/BIGINT on both sides (see functions/numeric.py for
why decimal-internal/double-out is the float-parity strategy).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Driver-window ordering. The correctness gate hash-checks exactly the
    # first 50 entries of queries(); priority (then registration order)
    # decides which land inside that window. Default 100 = in-window;
    # 900 = back-of-book (oracle-less iterative queries and relational
    # variants whose SURVEY §2 rows are already covered by an in-window
    # hash-green query — see tests/test_registry_window.py).
    priority: int = 100


_REGISTRY: dict[str, QuerySpec] = {}
_ORDER: dict[str, int] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    priority: int = 100,
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name, fn, oracle, doc or (fn.__doc__ or ""), tags, priority
        )
        _ORDER[name] = len(_ORDER)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """All queries, ordered by (priority, registration order)."""
    names = sorted(_REGISTRY, key=lambda n: (_REGISTRY[n].priority, _ORDER[n]))
    return {n: _REGISTRY[n] for n in names}
