"""Query catalog: every operator from SURVEY.md §2 as a (Spark build fn,
DuckDB oracle SQL) pair, keyed by query name.

``__spark_entry__.py`` exposes this registry to the correctness driver;
``bench.py`` runs the ``bench=True`` subset. Import order of the content
modules populates REGISTRY via the @register decorator.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    # The whole catalog is benched as of round 10 (190/190 anchored in
    # bench_baseline.json under the two-context anchor policy); the flag
    # survives so a future genuinely-unbenchable entry can opt out.
    bench: bool = True
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = True,
    tags: tuple[str, ...] = (),
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, build=fn, oracle=oracle, bench=bench, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all plan modules (idempotent) and return the registry."""
    from . import (  # noqa: F401
        dataset_q,
        docs_q,
        events_q,
        html_q,
        pipeline_q,
        quality_q,
        relational,
        sketches_q,
        temporal_q,
        tpch_q,
        textual,
        vectors_q,
    )

    return REGISTRY
