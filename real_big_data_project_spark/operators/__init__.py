from . import aggregates, dedup, joins, windows

__all__ = ["aggregates", "dedup", "joins", "windows"]
