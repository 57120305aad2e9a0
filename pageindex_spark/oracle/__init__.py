from .bm25 import (  # noqa: F401
    OracleIndex,
    bm25_topk,
    phrase_topk,
    query_string_topk,
)
