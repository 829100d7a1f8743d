"""O18 display-truncation parity tests."""

from __future__ import annotations

from project_final_parquet_spark.display import truncate_for_display
from project_final_parquet_spark.encryption.cell import sparse_rows_df


def test_long_values_truncate_reference_style(spark):
    df = sparse_rows_df(
        spark, [{"A": "X" * 5000, "B": "short"}, {"A": "y" * 100}]
    )
    rows = {r.B: r.A for r in truncate_for_display(df).collect()}
    assert rows["short"] == "X" * 100 + "... [5000 chars]"
    assert rows[""] == "y" * 100  # exactly max length → untouched


def test_public_functions_namespace_imports():
    from project_final_parquet_spark import functions as EF

    for name in EF.__all__:
        assert callable(getattr(EF, name)), name
