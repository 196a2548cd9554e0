"""The Arrow/numpy ANN kernel must agree with the SQL-fold baseline."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from syntheticdata_pipeline__spark.operators.similarity import (
    brute_force_topk,
    topk_pandas_kernel,
)

from .conftest import SF_SMOKE


def test_pandas_kernel_matches_fold_baseline(spark):
    np = pytest.importorskip("numpy")  # noqa: F841
    corpus = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 5)
    baseline = brute_force_topk(corpus, queries, k=3)
    q_pd = queries.select("vec_id", "embedding").toPandas()
    kernel = topk_pandas_kernel(corpus, q_pd, k=3)
    b = sorted((r.query_id, r.rank, r.neighbor_id) for r in baseline.collect())
    k = sorted((r.query_id, r.rank, r.neighbor_id) for r in kernel.collect())
    assert b == k


def test_lsh_neardup_pairs_subset_of_exact(spark):
    """LSH-bucketed near-dup pairs are a strict candidate-restricted
    subset of the exact all-pairs result (same threshold, same dot), and
    every emitted pair really clears the threshold."""
    from syntheticdata_pipeline__spark.functions.vectors import dot
    from syntheticdata_pipeline__spark.operators.similarity import lsh_neardup_pairs

    corpus = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in lsh_neardup_pairs(corpus, threshold=0.3, label_col="label").collect()
    }
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r.id_a, r.id_b): r.cos
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= 0.3)
        .collect()
    }
    assert set(lsh) <= set(exact)
    assert all(abs(lsh[k] - exact[k]) < 1e-12 for k in lsh)
    assert all(v >= 0.3 for v in lsh.values())


def test_lsh_multi_probe_recall_monotone(spark):
    """Multi-probe (Hamming-1) candidates are a superset of single-bucket
    candidates and still a subset of the exact pairs."""
    from syntheticdata_pipeline__spark.functions.vectors import dot
    from syntheticdata_pipeline__spark.operators.similarity import lsh_neardup_pairs

    corpus = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    single = {
        (r.id_a, r.id_b)
        for r in lsh_neardup_pairs(corpus, threshold=0.25).collect()
    }
    probed = {
        (r.id_a, r.id_b)
        for r in lsh_neardup_pairs(corpus, threshold=0.25, multi_probe=True).collect()
    }
    a = corpus.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = corpus.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= 0.25)
        .collect()
    }
    assert single <= probed <= exact
    print(f"recall: single {len(single)}/{len(exact)}, probed {len(probed)}/{len(exact)}")


def test_ann_recall_floor(spark):
    """ann_recall_at_k reports recall@5 vs the exact brute-force top-5;
    the stated floors (multi-probe LSH >= 0.25, IVF >= 0.6) must hold —
    the VERDICT r5 #7 acceptance. Measured on this fixture: lsh 0.30,
    ivf 0.84 at sf0.001 (0.52 / 0.78 at sf0.01)."""
    from syntheticdata_pipeline__spark.plans.vectors_q import ann_recall_at_k

    recalls = {
        r["method"]: r["recall"] for r in ann_recall_at_k(spark, SF_SMOKE).collect()
    }
    assert set(recalls) == {"lsh", "ivf"}
    assert recalls["lsh"] >= 0.25
    assert recalls["ivf"] >= 0.6


def test_ivf_trained_recall_floor(spark):
    """ann_ivf_trained_topk (Lloyd codebook trained on the seeded 30%
    sample, nprobe=3) recall@5 floor. Measured on this fixture: 0.56 at
    sf0.001 (0.60 at sf0.01 — better than the r6 full-corpus-trained
    nprobe=2 form's 0.42; sampling noise costs a little recall, one
    extra probe more than buys it back)."""
    from syntheticdata_pipeline__spark.plans.vectors_q import ann_ivf_trained_topk

    row = ann_ivf_trained_topk(spark, SF_SMOKE).collect()[0]
    assert row["method"] == "ivf_trained"
    assert row["n_true"] == 50
    assert row["recall"] >= 0.5


def _flat_lsh_pairs(df, threshold, n_planes, dim, label_col=None, multi_probe=False):
    """The pre-collapse flat bucket join (every row on both sides) — kept
    here as the reference implementation the identical-vector collapse in
    lsh_neardup_pairs must be output-equivalent to."""
    from syntheticdata_pipeline__spark.functions.vectors import dot
    from syntheticdata_pipeline__spark.operators.similarity import (
        hyperplanes,
        lsh_bucket,
    )

    planes = hyperplanes(n_planes, dim)
    cols = [F.col("vec_id"), F.col("embedding")] + (
        [F.col(label_col)] if label_col else []
    )
    b = df.select(*cols, lsh_bucket(F.col("embedding"), planes).alias("bucket"))
    a_cols = [
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
        *([F.col(label_col).alias("__la")] if label_col else []),
    ]
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << h)) for h in range(n_planes)],
        )
        a_side = b.select(*a_cols, F.explode(probes).alias("bucket"))
    else:
        a_side = b.select(*a_cols, "bucket")
    b_side = b.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
        *([F.col(label_col).alias("__lb")] if label_col else []),
        "bucket",
    )
    pairs = a_side.join(b_side, "bucket").filter(F.col("id_a") < F.col("id_b"))
    if multi_probe:
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    out = [
        F.col("id_a"),
        F.col("id_b"),
        dot(F.col("__va"), F.col("__vb")).alias("cos_sim"),
    ]
    if label_col:
        out.append((F.col("__la") == F.col("__lb")).alias("same_label"))
    return pairs.select(*out).filter(F.col("cos_sim") >= threshold)


@pytest.mark.parametrize("multi_probe", [False, True])
def test_collapse_equals_flat_join_on_duplicate_heavy_corpus(spark, multi_probe):
    """The identical-vector collapse must be bit-equivalent to the flat
    bucket join on a corpus with planted exact-duplicate groups — members
    interleaved across groups (so rep ordering != member ordering) and
    labels varying WITHIN a duplicate group (so same_label comes from the
    members, not the group)."""
    from syntheticdata_pipeline__spark.operators.similarity import lsh_neardup_pairs

    base = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").filter(
        F.col("vec_id") < 40
    )
    n = 40
    # three replicas of every vector: ids k, k+n, k+2n — and flip the
    # label parity on the second replica so duplicate groups mix labels
    dup = base
    for i in (1, 2):
        dup = dup.unionByName(
            base.select(
                (F.col("vec_id") + i * n).alias("vec_id"),
                "embedding",
                ((F.col("label") + i) % 3).cast("int").alias("label"),
            )
        )
    kw = dict(threshold=0.3, n_planes=4, dim=64, label_col="label", multi_probe=multi_probe)
    got = {
        (r.id_a, r.id_b): (r.cos_sim, r.same_label)
        for r in lsh_neardup_pairs(dup, **kw).collect()
    }
    want = {
        (r.id_a, r.id_b): (r.cos_sim, r.same_label)
        for r in _flat_lsh_pairs(dup, **kw).collect()
    }
    assert got == want  # exact float equality: same arrays, same fold
    # sanity: the duplicate groups actually produced intra-group pairs
    assert any(b - a in (n, 2 * n) for a, b in got)
