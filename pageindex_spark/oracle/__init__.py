from .bm25 import OracleIndex, bm25_topk, phrase_topk  # noqa: F401
