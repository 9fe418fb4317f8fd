from borsa_spark.functions import (
    bpe,
    classifier,
    dedup,
    graph,
    html,
    langid,
    layout,
    packing,
    pca,
    retrieval,
    similarity,
    text,
    urls,
)

__all__ = [
    "bpe", "classifier", "dedup", "graph", "html", "langid", "layout",
    "packing", "pca", "retrieval", "similarity", "text", "urls",
]
