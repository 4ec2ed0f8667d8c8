"""Deterministic synthetic web-page corpus (FIXTURES.md §1)."""
