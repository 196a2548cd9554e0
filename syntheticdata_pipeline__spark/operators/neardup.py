"""Near-duplicate detection (SURVEY.md §2.11): MinHash+LSH, SimHash,
n-gram Jaccard. Generalizes the reference's hash-set dedup (D1-D4,
any_scraper.py:198-222,584-603) to fuzzy text dedup at corpus scale.

Engine-portability: all hashing is md5-based (identical hex in Spark and
DuckDB), signatures are computed with strict sequential folds, so the
DuckDB oracle reproduces every signature bit-for-bit.

Scale design:
- Shingling + signatures are map-side only (one corpus scan).
- LSH banding turns the quadratic all-pairs problem into a groupBy on
  (band_id, band_hash) — candidate pairs come from a self-join *within
  buckets*, which is the standard 100 TB-safe plan. Bucket skew (a
  boilerplate shingle shared by millions of docs) is handled by AQE skew
  join + an optional bucket-size cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql


def word_shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, ' '-joined."""
    toks = tokens(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def word_shingles_sql(text_sql: str, n: int = 3) -> str:
    toks = tokens_sql(text_sql)
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


def minhash_signature(shingles: Column, num_hashes: int = 12, salt: str = "mh") -> Column:
    """MinHash signature: per hash-function i, the lexicographic min of
    md5(i|shingle). String-min is portable and order-free; md5 plays the
    role of the i-th random permutation."""
    sigs = [
        F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{salt}{i}|"), s))))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_signature_sql(shingles_sql: str, num_hashes: int = 12, salt: str = "mh") -> str:
    sigs = [
        f"list_min(list_transform({shingles_sql}, s -> md5('{salt}{i}|' || s)))"
        for i in range(num_hashes)
    ]
    return "[" + ", ".join(sigs) + "]"


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band.

    rows-per-band = num_hashes/bands; a pair collides on a band iff that
    slice of the signature matches exactly. Returns (id_a, id_b, n_bands)
    with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(word_shingles(F.col(text_col), shingle_n), num_hashes)
    with_sig = docs.select(F.col(id_col).alias("id"), sig.alias("sig"))
    banded = with_sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws("", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)).alias(
                            "bh"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").cast("bigint").alias("n_bands"))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays.

    Computed as |∩| / (|A| + |B| − |∩|) — avoids array_union whose element
    order differs between engines (sizes don't)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - F.size(F.array_intersect(a, b))).cast("double")


def jaccard_sql(a: str, b: str) -> str:
    inter = f"CAST(len(list_intersect({a}, {b})) AS DOUBLE)"
    return (
        f"({inter} / CAST(len({a}) + len({b}) - len(list_intersect({a}, {b})) AS DOUBLE))"
    )


def simhash16(text_col: Column, salt: str = "sh") -> Column:
    """16-bit SimHash over whitespace tokens.

    Bit b is 1 iff Σ_tokens (±1 by bit b of md5(token)) > 0. Bits come from
    hex nibbles of the md5 (nibble b > 7 ⇒ bit set) — portable to DuckDB.
    16 bits keeps the expression tree (and the oracle) tractable while
    exercising the real SimHash plan shape; widen to 64 by raising
    ``n_bits`` in :func:`simhash_bits`.
    """
    return simhash_bits(text_col, 16, salt)


def simhash_bits(text_col: Column, n_bits: int, salt: str) -> Column:
    toks = tokens(text_col)

    def bit_vote(b: int):
        # nibble b of md5(token): hex char at position b+1; high nibble → +1
        def merge(a: Column, t: Column) -> Column:
            hexc = F.substring(F.md5(F.concat(F.lit(salt), t)), b + 1, 1)
            return a + F.when(F.instr(F.lit("89abcdef"), hexc) > 0, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(toks, F.lit(0), merge)

    acc = F.lit(0).cast("bigint")
    for b in range(n_bits):
        acc = acc + F.when(bit_vote(b) > 0, F.lit(2 ** b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return acc


def simhash_bits_sql(text_sql: str, n_bits: int, salt: str) -> str:
    toks = tokens_sql(text_sql)
    terms = []
    for b in range(n_bits):
        vote = (
            f"list_reduce(list_prepend(0, list_transform({toks}, "
            f"t -> CASE WHEN strpos('89abcdef', substr(md5('{salt}' || t), {b + 1}, 1)) > 0 "
            f"THEN 1 ELSE -1 END)), (a, v) -> a + v)"
        )
        terms.append(f"CASE WHEN {vote} > 0 THEN {2 ** b}::BIGINT ELSE 0::BIGINT END")
    return "(" + " + ".join(terms) + ")"


def hamming16(a: Column, b: Column) -> Column:
    """Hamming distance between two 16-bit simhashes via popcount of XOR
    (expression form; portable)."""
    x = a.bitwiseXOR(b)
    return sum(
        [F.when(x.bitwiseAND(F.lit(1 << b)) != 0, F.lit(1)).otherwise(F.lit(0)) for b in range(16)],
        F.lit(0),
    )


def hamming16_sql(a: str, b: str) -> str:
    terms = [f"CASE WHEN xor({a}, {b}) & {1 << b} != 0 THEN 1 ELSE 0 END" for b in range(16)]
    return "(" + " + ".join(terms) + ")"
