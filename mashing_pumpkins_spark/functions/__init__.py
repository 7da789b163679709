from .sketch_np import (  # noqa: F401
    batch_signatures,
    bray_curtis_dissimilarity,
    counted_signature,
    dice,
    doc_hashes,
    jaccard,
    jaccard_containment,
    merge_counted,
    merge_signatures,
    signature,
)
