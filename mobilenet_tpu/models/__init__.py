from . import mobilenet_v1

__all__ = ["mobilenet_v1"]
