from .scalar import (
    array_cosine,
    array_entropy,
    array_euclidean,
    array_jaccard,
    array_logsumexp,
    chi_square,
    clean_html,
    lcs_length,
    rbf_kernel,
)

__all__ = [
    "array_cosine",
    "array_entropy",
    "array_euclidean",
    "array_jaccard",
    "array_logsumexp",
    "chi_square",
    "clean_html",
    "lcs_length",
    "rbf_kernel",
]
