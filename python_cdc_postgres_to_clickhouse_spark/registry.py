"""Query registry: the declared operator inventory.

Every operator from SURVEY.md §2 is declared here as a named query — a
callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB-compatible ANSI-SQL oracle string over the same Parquet tables.
The driver runs both sides at sf0.01 and compares row count, schema, and an
order-insensitive value hash; queries must alias every computed column
identically on both sides.

Float determinism: Spark and DuckDB must produce *bit-identical* doubles.
Aggregates over money columns therefore cast inputs to DECIMAL (exact,
order-insensitive sums on both engines) and cast the final result back to
DOUBLE — see ``queries/_exprs.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import for registration side effects.
    from . import queries as _q  # noqa: F401
    from . import operators as _o  # noqa: F401

    return dict(REGISTRY)
