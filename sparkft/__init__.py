"""sparkft — a PySpark-native fulltext engine with charabia-compatible tokenization.

From-scratch reimplementation of the tokenization semantics of
meilisearch/charabia 0.9.9 (reference snapshot at /root/reference; see
docstrings for file:line parity citations) as vectorized, Arrow-batched
functions suitable for `pandas_udf`/`mapInArrow`, plus a brand-new
inverted-index build + BM25 top-k query engine designed for multi-executor
Spark clusters (salted repartition-by-token merge, delta+varint posting
compression, block-max WAND).
"""

from .builder import Tokenizer, TokenizerBuilder
from .config import TokenizerConfig
from .tokenizer import Token, reconstruct, segment_str, tokenize_batch, tokenize_str

__all__ = [
    "Tokenizer",
    "TokenizerBuilder",
    "TokenizerConfig",
    "Token",
    "tokenize_str",
    "segment_str",
    "tokenize_batch",
    "reconstruct",
]

__version__ = "0.1.0"
