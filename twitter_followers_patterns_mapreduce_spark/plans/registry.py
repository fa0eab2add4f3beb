"""Query registry — the engine's named-query surface.

The reference selects a "query" by editing ``job.name`` in the Makefile
and recompiling (``Makefile:8-9``, ``README.md:87``); constants like the
MAX filter are compile-time edits.  Here every query is a named entry
taking ``(spark, sf_dir)`` with parameters as plain Python arguments,
and (where ANSI-SQL-expressible) a DuckDB oracle string for the
correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL; None → driver does rows-only check
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, description: str = ""):
    """Decorator adding a query to the global registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, description=description)
        return fn

    return deco


#: Every module that registers queries.  Imports are unconditional: a
#: missing or broken plans module must fail loudly here, never silently
#: shrink the query surface (a blanket ``except ImportError: pass`` once
#: hid six unbuilt modules and ~930 LoC of unverified operators).
_PLAN_MODULES = (
    "twitter_followers_patterns_mapreduce_spark.plans.core_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.relational_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.text_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.dedup_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.similarity_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.event_queries",
    "twitter_followers_patterns_mapreduce_spark.plans.multimodal_queries",
)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    for mod in _PLAN_MODULES:
        __import__(mod)


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}


def get_spec(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
