"""project_final_parquet_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``Shruti27272727/project-final-parquet`` (an encrypted
columnar Parquet-style format demo; see SURVEY.md), widened into a full
analytics engine:

- ``encryption/``  — per-column AES-GCM encrypted Parquet write/read with
  selective-decryption masking and a mock-KMS envelope-key cascade
  (reference parity: src/parquet_writer.cpp, src/parquet_reader.cpp,
  src/kms.cpp, src/crypto_utils.cpp).
- ``operators/``   — relational query suite (scan/filter/agg/join/window/
  set-ops/functions) plus LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns).
- ``streaming/``   — Structured Streaming windowed/sessionized event
  processing with batch-equivalent semantics.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and AQE; Python UDFs appear only where built-in
operators cannot express the semantics (and then always Arrow-vectorized).
"""

__version__ = "0.1.0"
