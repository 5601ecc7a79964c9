from . import entry_queries

__all__ = ["entry_queries"]
