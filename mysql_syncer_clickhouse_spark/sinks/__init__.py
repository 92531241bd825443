"""Sink connectors (ClickHouse HTTP bulk writer)."""
