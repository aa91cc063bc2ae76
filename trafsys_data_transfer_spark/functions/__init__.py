"""Engine column-function API — the reusable, composable Column helpers.

Mirrors the role of ``pyspark.sql.functions`` for engine-specific
semantics: everything here takes/returns ``Column`` (or is a thin Pandas
UDF wrapper) and can be dropped into any DataFrame expression.  The
implementations live next to their operators; this module is the stable
import surface:

    from trafsys_data_transfer_spark.functions import cosine, fingerprint

Text / hashing::

    normalize_text(col)      canonical lowercase/collapsed-whitespace form
    fingerprint(col)         md5 content fingerprint of normalized text
    shingles(tokens, n)      distinct word n-gram shingles
    jaccard(a, b)            exact Jaccard similarity of two array sets
    minhash_signature(sh)    k-wide MinHash signature (Arrow-vectorized)
    simhash(tokens)          64-bit SimHash (Arrow-vectorized)

Vectors::

    dot(a, b) / norm(a) / cosine(a, b)   deterministic sequential-sum math
    as_double(a)                         array<float> → array<double>
    lsh_buckets(vec)                     random-hyperplane LSH bucket ids
"""

from ..operators.dedup import (
    fingerprint,
    jaccard,
    minhash_signature,
    normalize_text,
    shingles,
    simhash,
)
from ..operators.similarity import as_double, cosine, dot, lsh_buckets, norm

__all__ = [
    "as_double",
    "cosine",
    "dot",
    "fingerprint",
    "jaccard",
    "lsh_buckets",
    "minhash_signature",
    "norm",
    "normalize_text",
    "shingles",
    "simhash",
]
