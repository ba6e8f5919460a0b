from .text import word_ngrams, words
from .hashing import md5_minhash, hex_sign
from .vectors import cosine_similarity, dot, norm, to_double_array

__all__ = [
    "words",
    "word_ngrams",
    "md5_minhash",
    "hex_sign",
    "cosine_similarity",
    "dot",
    "norm",
    "to_double_array",
]
