from .dataframe_bm25 import analyze_query_terms, topk_search

__all__ = ["analyze_query_terms", "topk_search"]
