from yaii_ray.analysis.tokenizer import (
    STOPWORDS,
    get_analyzer,
    tokenize_string,
    tokenize_strings,
)
from yaii_ray.analysis import stemmer as _stemmer  # registers "porter"/"porter_stop"
from yaii_ray.analysis.stemmer import porter_stem, stem_tokens
from yaii_ray.analysis.terms import (
    TERM_FALSE,
    TERM_TRUE,
    bool_to_term,
    number_to_terms,
    string_to_term,
    term_to_token,
)

__all__ = [
    "STOPWORDS",
    "porter_stem",
    "stem_tokens",
    "tokenize_string",
    "tokenize_strings",
    "get_analyzer",
    "string_to_term",
    "bool_to_term",
    "number_to_terms",
    "term_to_token",
    "TERM_TRUE",
    "TERM_FALSE",
]
