from .analyze import analyze, analyze_batch, normalize_token, term_counts
from .porter2 import stem, stem_cached
from .stopwords import RAW_STOPWORDS, analyzed_stopwords

__all__ = [
    "analyze",
    "analyze_batch",
    "normalize_token",
    "term_counts",
    "stem",
    "stem_cached",
    "RAW_STOPWORDS",
    "analyzed_stopwords",
]
