"""Multimodal (binary) column operators. Filled in Phase 3."""
