from . import text, dedup, similarity

__all__ = ["text", "dedup", "similarity"]
