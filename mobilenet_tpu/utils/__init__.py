from . import golden

__all__ = ["golden"]
