"""pageindex_spark — PySpark-native full-text index + BM25 retrieval engine.

Public API (replaces the reference's ``pageindex.page_index(doc, **opt)``
entry point, ``/root/reference/pageindex/page_index.py:1101-1109``):

    from pageindex_spark import build_index, search
    paths = build_index(spark, docs_df, "/path/to/index")
    topk_df = search(spark, "/path/to/index", [(1, "query text")], k=10)
"""

from .plans.build_index import IndexPaths, build_index, build_metrics  # noqa: F401
from .plans.query import (  # noqa: F401
    more_like_this,
    rescore_phrase,
    search,
    search_collapse,
    search_collapse_inner,
    search_function_score,
    search_fuzzy,
    search_prefix,
    search_query_string,
    search_regexp,
    search_snippets,
    search_synonyms,
    search_wildcard,
    suggest_spelling,
    suggest_terms,
)
from .plans.hybrid import hybrid_search_linear, hybrid_search_rrf  # noqa: F401
from .session import get_spark, warm_up  # noqa: F401
