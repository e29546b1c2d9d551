"""Module-level memo for built Column expression trees.

Why: every ``pyspark.sql.functions`` call is a py4j round-trip (~0.5-1ms);
the deep document-emission and extraction trees build hundreds of Column
objects, so PLAN CONSTRUCTION costs 3-5s per factory query — measured at
25-30% of the warm end-to-end latency at bench scale (stage profile, r5).
The trees are pure functions of code + small keys (dialect, field list),
never of the input DataFrame: a ``Column`` is an UNRESOLVED expression
referencing columns by name, so one built tree can be reused across any
number of DataFrames, queries, and SparkSessions within a driver process
(the py4j gateway and its JVM outlive ``spark.stop()``; expression trees
hold no session reference — the analyzer resolves them per-plan).

Usage:
    cols = memo("emit.doc:v6", lambda: [  ...build Columns... ])

The builder runs once per key per process; later calls are a dict hit.
Keys must capture every parameter the built tree depends on.
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")

_CACHE: dict = {}


def memo(key: str, builder: Callable[[], T]) -> T:
    """Return the cached expression tree for ``key``, building on miss."""
    hit = _CACHE.get(key)
    if hit is None:
        hit = _CACHE[key] = builder()
    return hit


def clear() -> None:
    """Drop all cached trees (test hook; never needed in production)."""
    _CACHE.clear()
