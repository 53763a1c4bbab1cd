from . import trends, relational, dedup, similarity, text, multimodal

__all__ = ["trends", "relational", "dedup", "similarity", "text", "multimodal"]
