from . import files  # noqa: F401

__all__ = ["files"]
