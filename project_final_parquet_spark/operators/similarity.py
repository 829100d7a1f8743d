"""Embedding similarity-search operators. Filled in Phase 3."""
