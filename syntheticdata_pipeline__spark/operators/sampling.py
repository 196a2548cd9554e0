"""Weighted / hierarchical sampling (SURVEY.md §2.8 M4-M6, sources S8/S9).

The reference samples prompt attributes with unseeded ``random`` over
weighted dicts (keyword_sampler.py:5-46, easy/medium/hard samplers). The
engine's version is columnar and *seeded*: each row's draw is a
deterministic md5-keyed uniform (functions.determinism.unit_rand), so runs
reproduce exactly at any parallelism — the divergence from the reference
(distributional equivalence, not bitwise) is intentional and documented.

Weighted choice is a broadcast join against a cumulative-weight dim table:
no shuffle of the fact side, O(|dims|) broadcast — at 100 TB the fact scan
dominates and the sampler adds a map-side-only stage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import unit_rand


def cumulative_weights(items: Sequence[tuple[str, float]]) -> list[tuple[str, float, float]]:
    """(name, weight) → (name, cum_lo, cum_hi) normalized to [0, 1).

    The running-sum scan the reference does per call
    (keyword_sampler.py:5-14) happens once at plan build.

    Build-time validation (r13, queued fix #5): empty items used to
    surface as an IndexError one call away at ladder build; one negative
    weight silently redistributed mass (non-monotone bounds made an item
    unreachable); one NaN weight poisoned every bound and — under
    Spark's NaN-above-everything SQL ordering — turned the sampler into
    a constant. All three are config mistakes knowable here, rejected
    loudly. Zero TOTAL keeps its Python-parity ZeroDivisionError
    (random.choices raises on zero total too).
    """
    import math

    if not items:
        raise ValueError("cumulative_weights: items must be non-empty")
    for name, w in items:
        if not math.isfinite(w):
            raise ValueError(f"cumulative_weights: non-finite weight {w!r} for {name!r}")
        if w < 0:
            raise ValueError(f"cumulative_weights: negative weight {w!r} for {name!r}")
    total = float(sum(w for _, w in items))
    out: list[tuple[str, float, float]] = []
    acc = 0.0
    for name, w in items:
        lo = acc / total
        acc += w
        out.append((name, lo, acc / total))
    return out


def weighted_choice(
    df: DataFrame,
    key: Column,
    items: Sequence[tuple[str, float]],
    out_col: str,
    salt: str,
) -> DataFrame:
    """M4: one weighted draw per row, keyed by ``key`` + ``salt``.

    Implemented as a CASE ladder over precomputed cumulative bounds —
    pure whole-stage-codegen expression, no join, no shuffle.
    """
    bounds = cumulative_weights(items)
    r = unit_rand(key, salt)
    expr = F.lit(bounds[-1][0])
    # Build from the last bucket backwards: when r < hi_i take item_i.
    for name, _lo, hi in reversed(bounds[:-1]):
        expr = F.when(r < F.lit(hi), F.lit(name)).otherwise(expr)
    # The first bucket check must come first → fold in reverse gives that.
    return df.withColumn(out_col, expr)


def weighted_choice_sql(key_sql: str, items: Sequence[tuple[str, float]], salt: str) -> str:
    """DuckDB twin of :func:`weighted_choice` (CASE ladder, same bounds)."""
    from ..functions.determinism import unit_rand_sql

    bounds = cumulative_weights(items)
    r = unit_rand_sql(key_sql, salt)
    cases = " ".join(
        f"WHEN {r} < {hi!r} THEN '{name}'" for name, _lo, hi in bounds[:-1]
    )
    return f"(CASE {cases} ELSE '{bounds[-1][0]}' END)"


def category_gates(
    df: DataFrame,
    key: Column,
    gates: Sequence[tuple[str, float]],
    prefix: str = "pick_",
) -> DataFrame:
    """M5: independent per-category inclusion gates
    (``random.random() < prob``, easy_sampler.py:26-42), one deterministic
    draw per (row, category)."""
    out = df
    for cat, prob in gates:
        out = out.withColumn(f"{prefix}{cat}", unit_rand(key, f"gate|{cat}") < F.lit(prob))
    return out


def hierarchical_sample(
    df: DataFrame,
    key: Column,
    tree: dict,
    out_col: str,
    salt: str = "hier",
) -> DataFrame:
    """M6: recursive weighted descent over a *static* config tree
    (keyword_sampler.py:16-46) unrolled at plan-build time.

    ``tree`` nodes: ``{"prob": w, "keywords": [(name, w), ...]}`` for
    leaves or ``{"prob": w, "children": {name: node}}`` for interior nodes.
    Each level consumes an independent salted draw; the unrolled plan is a
    nested CASE — still a single codegen stage.
    """

    def build(node: dict, path: str) -> Column:
        if "keywords" in node:
            bounds = cumulative_weights(node["keywords"])
            r = unit_rand(key, f"{salt}|{path}|leaf")
            expr = F.lit(bounds[-1][0])
            for name, _lo, hi in reversed(bounds[:-1]):
                expr = F.when(r < F.lit(hi), F.lit(name)).otherwise(expr)
            return expr
        children = node["children"]
        bounds = cumulative_weights([(k, v.get("prob", 1.0)) for k, v in children.items()])
        r = unit_rand(key, f"{salt}|{path}|node")
        expr = build(children[bounds[-1][0]], f"{path}/{bounds[-1][0]}")
        for name, _lo, hi in reversed(bounds[:-1]):
            expr = F.when(r < F.lit(hi), build(children[name], f"{path}/{name}")).otherwise(expr)
        return expr

    return df.withColumn(out_col, build(tree, "root"))


def gates_with_backfill(
    df: DataFrame,
    key: Column,
    gates: Sequence[tuple[str, float]],
    min_count: int,
    key_out: str = "key",
) -> DataFrame:
    """M5 full semantics: independent per-category gates, then backfill
    from the unselected categories until ``min_count`` picks per key
    (medium_sampler.py:24-50, MIN=4; hard_sampler.py:31-59).

    Returns one row per (key, category) with ``selected``. Backfill order
    is a seeded per-(key, category) draw — distributionally equivalent to
    the reference's weighted-without-replacement fill, bitwise-seeded for
    replay. Columnar plan: explode to (key × category) rows, rank the
    unselected per key, admit ranks up to the deficit — two window
    functions, one shuffle on the key.
    """
    cats = F.array(*[F.lit(c) for c, _ in gates])
    exploded = df.select(key.alias(key_out), F.explode(cats).alias("category"))
    prob_col = F.lit(None).cast("double")
    for c, p in gates:
        prob_col = F.when(F.col("category") == c, F.lit(p)).otherwise(prob_col)
    marked = exploded.select(
        key_out,
        "category",
        prob_col.alias("prob"),
        unit_rand(F.concat(F.col(key_out).cast("string"), F.lit("|"), F.col("category")), "gate").alias(
            "r_gate"
        ),
        unit_rand(F.concat(F.col(key_out).cast("string"), F.lit("|"), F.col("category")), "fill").alias(
            "r_fill"
        ),
    ).withColumn("gated", F.col("r_gate") < F.col("prob"))
    from pyspark.sql import Window

    w_cnt = Window.partitionBy(key_out)
    w_rank = Window.partitionBy(key_out, "gated").orderBy("r_fill", "category")
    ranked = marked.withColumn(
        "n_gated", F.sum(F.when(F.col("gated"), 1).otherwise(0)).over(w_cnt)
    ).withColumn("fill_rank", F.row_number().over(w_rank))
    return ranked.select(
        key_out,
        "category",
        (
            F.col("gated")
            | ((~F.col("gated")) & (F.col("fill_rank") <= F.greatest(F.lit(min_count) - F.col("n_gated"), F.lit(0))))
        ).alias("selected"),
    )


def hierarchical_sample_sql(key_sql: str, tree: dict, salt: str = "hier") -> str:
    """DuckDB twin of :func:`hierarchical_sample` — same salts, same
    unrolled nested CASE, bit-identical draws."""
    from ..functions.determinism import unit_rand_sql

    def build(node: dict, path: str) -> str:
        if "keywords" in node:
            bounds = cumulative_weights(node["keywords"])
            r = unit_rand_sql(key_sql, f"{salt}|{path}|leaf")
            cases = " ".join(f"WHEN {r} < {hi!r} THEN '{name}'" for name, _lo, hi in bounds[:-1])
            return f"(CASE {cases} ELSE '{bounds[-1][0]}' END)" if cases else f"'{bounds[-1][0]}'"
        children = node["children"]
        bounds = cumulative_weights([(k, v.get("prob", 1.0)) for k, v in children.items()])
        r = unit_rand_sql(key_sql, f"{salt}|{path}|node")
        cases = " ".join(
            f"WHEN {r} < {hi!r} THEN {build(children[name], f'{path}/{name}')}"
            for name, _lo, hi in bounds[:-1]
        )
        tail = build(children[bounds[-1][0]], f"{path}/{bounds[-1][0]}")
        return f"(CASE {cases} ELSE {tail} END)" if cases else tail

    return build(tree, "root")


def reference_dict_to_tree(weighted_dict: dict) -> dict:
    """Convert a reference-style nested probability dictionary
    (keywords_dictionary.py:3-45 shape: ``{key: {"prob": p, "keywords":
    [(name, w), ...]}}`` or nested sub-dicts) into the sampler tree format
    consumed by :func:`hierarchical_sample`."""
    children = {}
    for name, node in weighted_dict.items():
        prob = float(node.get("prob", 1.0))
        if "keywords" in node:
            children[name] = {
                "prob": prob,
                "keywords": [(str(k), float(w)) for k, w in node["keywords"]],
            }
        else:
            sub = {k: v for k, v in node.items() if isinstance(v, dict)}
            children[name] = {"prob": prob, **reference_dict_to_tree(sub)}
    return {"children": children}


def generator_source(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """S8: synthesize n keyed rows to sample attributes onto.

    ``spark.range`` is an embarrassingly parallel source — the 100 TB
    analog generates billions of rows with zero input I/O.
    """
    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.withColumnRenamed("id", "sample_id")
