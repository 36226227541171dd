from .text import (token_count_expr, bpe_token_estimate_expr, char_len_expr,
                   alpha_ratio_expr, digit_ratio_expr, punct_ratio_expr,
                   whitespace_only_expr, fingerprint_expr, normalize_text_expr,
                   langid_struct_expr, make_langid_udf, toxicity_exprs,
                   LANG_STOPWORDS, TOXIC_KEYWORDS)
from .perplexity import make_perplexity_udf, perplexity_of, CHAR_LM

__all__ = [
    "token_count_expr", "bpe_token_estimate_expr", "char_len_expr",
    "alpha_ratio_expr", "digit_ratio_expr", "punct_ratio_expr",
    "whitespace_only_expr", "fingerprint_expr", "normalize_text_expr",
    "langid_struct_expr", "make_langid_udf", "toxicity_exprs",
    "LANG_STOPWORDS", "TOXIC_KEYWORDS",
    "make_perplexity_udf", "perplexity_of", "CHAR_LM",
]
