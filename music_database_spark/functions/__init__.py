from .vector import dot, l2_norm, cosine_similarity, as_double_array

__all__ = ["dot", "l2_norm", "cosine_similarity", "as_double_array"]
