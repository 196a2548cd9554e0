"""Equivalence pins for the r14 Arrow block kernel behind
``embedding_cosine_neardup`` (operators.similarity.allpairs_cosine_pairs).

The kernel must be BIT-identical to the reference plan it replaced —
``a.join(b, id_a < id_b)`` + strict-sequential-fold dot + ``>= τ`` filter —
including the hostile corners the fold semantics define:

- NULL vector / NULL element / mismatched lengths → NULL dot → dropped;
- NaN dot → kept (Spark's NaN-is-greatest comparison semantics);
- +inf dot → kept; -inf dropped;
- NULL id → pair never emitted (three-valued ``<``);
- NULL label → NULL same_label on surviving pairs;
- byte-identical duplicate vectors pair normally (no collapse here —
  this is the labeled exact verifier).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syntheticdata_pipeline__spark.functions.vectors import dot
from syntheticdata_pipeline__spark.operators.similarity import allpairs_cosine_pairs

THRESH = 0.4


def _reference_pairs(df, threshold=THRESH):
    a = df.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("va"),
    )
    b = df.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("vb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            dot(F.col("va"), F.col("vb")).alias("cos_sim"),
            (F.col("la") == F.col("lb")).alias("same_label"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _assert_same(ref, new):
    extra = new.exceptAll(ref).count()
    missing = ref.exceptAll(new).count()
    assert (extra, missing) == (0, 0), (
        f"kernel diverges from fold plan: {extra} extra, {missing} missing"
    )
    assert ref.count() == new.count()


def test_kernel_matches_fold_on_corpus(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ref = _reference_pairs(df)
    new = allpairs_cosine_pairs(
        df, threshold=THRESH, id_col="vec_id", vec_col="embedding", label_col="label"
    )
    assert ref.count() > 0  # fixture must actually exercise the kernel
    _assert_same(ref, new)


HOSTILE_ROWS = [
    (1, [1.0, 0.0, 0.0], 10),            # clean
    (2, [0.9, 0.1, 0.0], 10),            # clean, pairs with 1
    (3, None, 11),                       # NULL vector
    (4, [1.0, None, 0.0], 11),           # NULL element -> NULL dot
    (5, [float("nan"), 0.0, 0.0], None), # NaN dot vs everything, NULL label
    (6, [float("inf"), 0.0, 0.0], 12),   # +inf dot vs positive x0
    (7, [1.0, 0.0], 12),                 # short vector: len-mismatch drops
    (8, [0.8, 0.0], 12),                 # short pair partner (len-2 group)
    (9, [], 13),                         # empty array
    (10, [], 13),                        # empty-empty dot = 0.0 < τ
    (11, [-1.0, 0.0, 0.0], 10),          # negative dot dropped
    (12, [1.0, 0.0, 0.0], 10),           # byte-duplicate of 1
    (None, [1.0, 0.0, 0.0], 10),         # NULL id never pairs
]


def test_kernel_matches_fold_on_hostile_fixture(spark):
    df = spark.createDataFrame(
        HOSTILE_ROWS, "vec_id long, embedding array<float>, label int"
    )
    ref = _reference_pairs(df)
    new = allpairs_cosine_pairs(
        df, threshold=THRESH, id_col="vec_id", vec_col="embedding", label_col="label"
    )
    _assert_same(ref, new)
    rows = {(r.id_a, r.id_b) for r in new.collect()}
    # the corners the fold semantics pin: NaN kept, inf kept, dup pairs,
    # equal-length short pair kept, NULL element / short-vs-long dropped
    assert (1, 5) in rows and (5, 12) in rows     # NaN is greatest
    assert (1, 6) in rows                          # +inf kept
    assert (1, 12) in rows                         # duplicate vectors
    assert (7, 8) in rows                          # same-length short pair
    assert (1, 4) not in rows                      # NULL element drops
    assert (1, 7) not in rows                      # length mismatch drops
    assert all(r.id_a is not None and r.id_b is not None for r in new.collect())
    nan_rows = [r for r in new.collect() if r.id_a == 1 and r.id_b == 5]
    assert nan_rows and nan_rows[0].cos_sim != nan_rows[0].cos_sim  # NaN payload
    assert nan_rows[0].same_label is None          # NULL label -> NULL


def test_kernel_no_label_variant(spark):
    df = spark.createDataFrame(
        [(i, [1.0, float(i) / 10.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    ref = (
        df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
        .join(
            df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")),
            F.col("id_a") < F.col("id_b"),
        )
        .select("id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= THRESH)
    )
    new = allpairs_cosine_pairs(df, threshold=THRESH, label_col=None)
    _assert_same(ref, new)


@pytest.mark.parametrize("blocks", [1, 3])
def test_kernel_block_count_invariant(spark, blocks):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    new = allpairs_cosine_pairs(df, threshold=THRESH, label_col="label", blocks=blocks)
    base = allpairs_cosine_pairs(df, threshold=THRESH, label_col="label")
    _assert_same(base, new)


def test_bucketed_kernel_matches_fold_join(spark):
    """bucketed_cosine_pairs must equal the equi-join + fold + filter it
    replaced inside lsh_neardup_pairs, hostile corners included (NULL
    bucket dropped, NULL element dropped, NaN kept, length mismatch
    dropped)."""
    from syntheticdata_pipeline__spark.operators.similarity import (
        bucketed_cosine_pairs,
    )

    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [0.9, 0.1]),
        (3, 0, None),                   # NULL vec
        (4, 0, [1.0, None]),            # NULL element
        (5, 0, [float("nan"), 0.0]),    # NaN dot
        (6, 1, [1.0, 0.0]),             # other bucket
        (7, 1, [0.8, 0.0, 0.0]),        # length mismatch within bucket
        (8, None, [1.0, 0.0]),          # NULL bucket: join drops
        (9, None, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "rid long, bucket int, vec array<float>"
    )
    a = df.select(F.col("rid").alias("ra"), F.col("vec").alias("__va"), "bucket")
    b = df.select(F.col("rid").alias("rb"), F.col("vec").alias("__vb"), "bucket")
    ref = (
        a.join(b, "bucket")
        .filter(F.col("ra") < F.col("rb"))
        .select("ra", "rb", dot(F.col("__va"), F.col("__vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
    )
    new = bucketed_cosine_pairs(a, b, threshold=0.4)
    assert ref.count() > 0
    assert new.exceptAll(ref).count() == 0
    assert ref.exceptAll(new).count() == 0
