"""Text-analysis operators for LLM data pipelines. Filled in Phase 3."""
