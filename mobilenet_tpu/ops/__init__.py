from . import conv, preprocess

__all__ = ["conv", "preprocess"]
