from .numeric import davg, dsum, sql_davg, sql_dsum

__all__ = ["dsum", "davg", "sql_dsum", "sql_davg"]
