from . import expression

__all__ = ["expression"]
