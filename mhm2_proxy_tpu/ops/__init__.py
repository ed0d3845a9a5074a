from .bitkmer import (  # noqa: F401
    kmer_words_from_codes,
    revcomp_words,
    canonicalize_words,
    lex_less,
    minimizers_from_codes,
    quick_hash_u64,
    forward_base_words,
    backward_base_words,
    ascii_to_codes,
    codes_to_ascii,
    words_to_strings,
    strings_to_words,
)
from .count import (  # noqa: F401
    read_kmer_records,
    aggregate_records,
    merge_aggregates,
    finalize_table,
)
from .lookup import table_lookup  # noqa: F401
