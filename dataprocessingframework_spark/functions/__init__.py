from dataprocessingframework_spark.functions.hashing import (
    MINHASH_PRIME,
    hash64,
    minhash_coeffs,
)
from dataprocessingframework_spark.functions.paths import (
    basename,
    path_concat,
    strip_prefix,
    with_suffix_replaced,
)

__all__ = [
    "MINHASH_PRIME",
    "hash64",
    "minhash_coeffs",
    "basename",
    "path_concat",
    "strip_prefix",
    "with_suffix_replaced",
]
