"""Event-stream operators (windowed aggs, sessionization). Filled in Phase 4."""
