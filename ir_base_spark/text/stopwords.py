"""English stopword list.

The reference loads a 749-entry stopword file at analyzer construction
(/root/reference/src/Analyzer/DocAnalyzer.java:141-156, data file
data/Model/stopwords.dat) and normalizes+stems each entry at load time so
that membership tests run on analyzed tokens.

We embed the public Snowball English stopword list (snowballstem.org,
distributed with the Snowball project) instead of copying the reference's
data file; the engine and the single-node oracle share this exact set, so
rank-identity is unaffected by the choice of list. Like the reference, the
set used for filtering is the NORMALIZED+STEMMED form of each entry
(DocAnalyzer.java:151-153).
"""

from __future__ import annotations

from functools import lru_cache

# Snowball English stopword list (public domain, snowballstem.org).
RAW_STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "would", "should", "could", "ought",
    "i'm", "you're", "he's", "she's", "it's", "we're", "they're", "i've",
    "you've", "we've", "they've", "i'd", "you'd", "he'd", "she'd", "we'd",
    "they'd", "i'll", "you'll", "he'll", "she'll", "we'll", "they'll",
    "isn't", "aren't", "wasn't", "weren't", "hasn't", "haven't", "hadn't",
    "doesn't", "don't", "didn't", "won't", "wouldn't", "shan't",
    "shouldn't", "can't", "cannot", "couldn't", "mustn't", "let's",
    "that's", "who's", "what's", "here's", "there's", "when's", "where's",
    "why's", "how's", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "will",
)


@lru_cache(maxsize=1)
def analyzed_stopwords() -> frozenset[str]:
    """Stopword set in analyzed (normalized + stemmed) form.

    Mirrors the reference's load-time Snowball stemming of each stopword
    (DocAnalyzer.java:151-153). Computed lazily to avoid import cycles.
    """
    from .analyze import normalize_token
    from .porter2 import stem

    out = set()
    for w in RAW_STOPWORDS:
        n = normalize_token(w)
        if n:
            out.add(stem(n))
    return frozenset(out)
