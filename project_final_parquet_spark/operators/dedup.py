"""Deduplication operators (exact + near-dup). Filled in Phase 3."""
