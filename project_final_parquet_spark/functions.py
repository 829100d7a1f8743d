"""Public function library — the engine's reusable column expressions,
re-exported in one namespace (the ``functions/`` surface of the engine).

Everything here is a pure Column expression or DataFrame transform
factory, composable inside arbitrary DataFrame plans.
"""

from __future__ import annotations

from .display import truncate_for_display
from .encryption.cell import decrypt_columns, encrypt_columns
from .operators.asof import asof_join
from .operators.dedup import _ngrams as ngrams
from .operators.dedup import _shingles3 as shingles3
from .operators.similarity import _dot as dot_product
from .operators.similarity import _norm as l2_norm
from .operators.skew import salted_join
from .registry import davg, dsum
from .streaming.events import session_windows, sliding_counts, tumbling_counts

__all__ = [
    "asof_join",
    "davg",
    "decrypt_columns",
    "dot_product",
    "dsum",
    "encrypt_columns",
    "l2_norm",
    "ngrams",
    "salted_join",
    "session_windows",
    "shingles3",
    "sliding_counts",
    "truncate_for_display",
    "tumbling_counts",
]
