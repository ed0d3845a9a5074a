"""Pure-Python oracle implementations of the pipeline semantics.

These are slow, dictionary/string based mirrors of the reference algorithms
(MetaHipMer2 contigging proxy), written from the spec for use as ground truth
in tests. The TPU kernels in ops/ and kcount/ must match these exactly.
"""

from .pyref import (  # noqa: F401
    kmer_to_words,
    words_to_kmer,
    revcomp_str,
    canonical,
    minimizer_of,
    quick_hash,
    count_kmers_oracle,
    ext_call,
    traverse_oracle,
)
