"""Similarity estimators as JVM-side Column expressions.

Since signatures are arrays of *distinct* values, Spark's array set
functions implement exactly the reference's frozenset estimators
(/root/reference/src/minhashsketch.py:709-736) with whole-stage codegen —
no Python in the verify hot loop.

Arrays hold uint64 bit patterns in signed bigints; set membership is
bit-pattern equality, so intersect/union sizes are unaffected by the signed
reinterpretation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaccard_similarity(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| (reference jaccard_similarity / jaccard_correspondance)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )


def jaccard_containment(a: Column, b: Column) -> Column:
    """|A∩B| / |A| (asymmetric; reference :720-726)."""
    inter = F.size(F.array_intersect(a, b))
    return F.when(
        F.size(a) > 0, inter.cast("double") / F.size(a).cast("double")
    ).otherwise(F.lit(0.0))


def dice_similarity(a: Column, b: Column) -> Column:
    """2q/(2q+r+s) (reference :728-736)."""
    q = F.size(F.array_intersect(a, b))
    denom = F.size(a) + F.size(b)  # == 2q + r + s
    return F.when(denom > 0, (q * 2).cast("double") / denom.cast("double")).otherwise(
        F.lit(0.0)
    )


def truncate_sketch_array(values: Column, k: int, minmax: str = "min") -> Column:
    """Distinct-and-truncate an array of raw i64-bit-pattern hash values to a
    bottom-k (or top-k) sketch in UNSIGNED uint64 order — the associative
    merge's n-ary form as a pure Column expression (whole-stage codegen, no
    Python). Feed it `flatten(collect_list(sig))` to merge any number of
    sketches in one JVM aggregation.

    Sign-bit flip (x ^ bigint_min) maps unsigned order onto signed order, so
    array_sort sorts correctly; flip back after slicing.
    """
    flipped = F.transform(
        F.array_distinct(values),
        lambda x: x.bitwiseXOR(F.lit(-9223372036854775808)),
    )
    ordered = F.array_sort(flipped)
    n = F.size(ordered)
    if minmax == "min":
        sliced = F.when(n <= k, ordered).otherwise(F.slice(ordered, 1, k))
    else:
        sliced = F.when(n <= k, ordered).otherwise(
            F.slice(ordered, n - F.lit(k) + F.lit(1), F.lit(k))
        )
    return F.transform(sliced, lambda x: x.bitwiseXOR(F.lit(-9223372036854775808)))


def merge_sketch_arrays(a: Column, b: Column, k: int, minmax: str = "min") -> Column:
    """Union-and-truncate of two signature arrays in UNSIGNED uint64 order —
    the reference's associative sketch merge (O11,
    /root/reference/src/minhashsketch.py:178-203) as a pure Column
    expression."""
    return truncate_sketch_array(F.array_union(a, b), k, minmax)


def add_hashvalues(sig: Column, values: Column, k: int, minmax: str = "min") -> Column:
    """Ingest raw hash values into a stored signature, conserving the
    bottom-k (or top-k) sketch characteristic — the engine-level form of the
    reference's MinSketch.add_hashvalues
    (/root/reference/src/minhashsketch.py:439-475).

    Semantics mirrored exactly: values merge by the same truncated distinct
    union as a sketch merge, and the caller's `nvisited` column is NOT
    incremented — the reference leaves nvisited untouched so hash-level
    ingestion can rebuild/extend sketches without distorting the visited
    count (reference note at :444-446). `values` may be raw i64-bit-pattern
    hashes (array<bigint>) from any source: a previously persisted
    signature, an external sketch interchange file, or synthetic probes.
    """
    return merge_sketch_arrays(sig, values, k, minmax)
