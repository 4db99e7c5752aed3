"""Query catalog — SURVEY.md §2 operators with DuckDB oracles."""

from .catalog import CatalogQuery, catalog, oracle_sql, queries

__all__ = ["CatalogQuery", "catalog", "oracle_sql", "queries"]
