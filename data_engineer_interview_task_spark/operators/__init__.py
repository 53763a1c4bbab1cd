from . import trends, relational, dedup, similarity, text, multimodal, tpch_shapes

__all__ = [
    "trends",
    "relational",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "tpch_shapes",
]
