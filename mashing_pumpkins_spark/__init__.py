"""mashing-pumpkins-spark: a PySpark-native near-duplicate detection engine.

Re-expresses the capabilities of ``lgautier/mashing-pumpkins`` (bottom-k /
top-k MinHash sketches over byte shingles, mergeable sketch algebra, set
similarity estimators) as an idiomatic Spark DataFrame pipeline:

    pages -> extract -> sketch (vectorized pandas UDF, bit-compatible with
    the reference's XXH64 / MurmurHash3-x64-128-low64 kernels) -> LSH bands
    -> candidate pairs (salted band join) -> exact sketch-Jaccard verify ->
    iterative connected-components clustering, checkpointed per stage.

Nothing here is a port: the reference is a single-process heap library; this
engine is a declarative Spark plan whose only custom kernels are the
vectorized numpy hash/sketch functions inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
