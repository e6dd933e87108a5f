from . import cleansing, hashing, text, vectors

__all__ = ["cleansing", "hashing", "text", "vectors"]
