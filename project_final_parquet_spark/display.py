"""Display helpers (reference O18: table pretty-print with truncation,
/root/reference/src/main.cpp:23-47 — values longer than
MAX_DISPLAY_LENGTH=100 print as the first 100 chars + ``... [N chars]``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_DISPLAY_LENGTH = 100  # reference src/main.cpp:13


def truncate_for_display(df: DataFrame, max_len: int = MAX_DISPLAY_LENGTH) -> DataFrame:
    """Return ``df`` with every string column truncated reference-style:
    values longer than ``max_len`` become ``<prefix>... [<N> chars]``."""
    exprs = []
    for field in df.schema.fields:
        if field.dataType.simpleString() == "string":
            c = F.col(field.name)
            exprs.append(
                F.when(
                    F.length(c) > max_len,
                    F.concat(
                        F.substring(c, 1, max_len),
                        F.lit("... ["),
                        F.length(c).cast("string"),
                        F.lit(" chars]"),
                    ),
                )
                .otherwise(c)
                .alias(field.name)
            )
        else:
            exprs.append(F.col(field.name))
    return df.select(*exprs)


def show_table(df: DataFrame, n: int = 20) -> None:
    """Reference-style table print (per-row, truncated values)."""
    truncate_for_display(df).show(n, truncate=False)
