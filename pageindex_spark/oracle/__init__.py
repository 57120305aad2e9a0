from .bm25 import OracleIndex, bm25_topk  # noqa: F401
