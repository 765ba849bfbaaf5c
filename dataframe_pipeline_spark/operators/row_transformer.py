"""RowTransformer — drop rows whose column value is in a drop-list.

Reference: /root/reference/dfpipeline/RowTransformer.py (drops rows where
``df[col].isin(drop_values)`` for each listed column).  Spark mapping: a
conjunction of ``~col.isin(...)`` predicates — a single Filter node that
Catalyst pushes toward the scan (parquet row-group skipping at scale).

pandas quirk: ``isin`` is False for NaN unless NaN is in the drop list, so
NULL rows are *kept*.  Spark's ``isin`` returns NULL for NULL input which
would drop the row through ``filter``; we OR an ``isNull`` guard to match.
``reset_index`` has no Spark meaning (no row index) and is accepted for API
compatibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..base import SparkDFPBase


class RowTransformer(SparkDFPBase):
    def __init__(self, columns=None, drop_values=None, reset_index: bool = True):
        self.columns = list(columns or [])
        self.drop_values = list(drop_values or [])
        self.reset_index = reset_index

    def transform(self, df: DataFrame) -> DataFrame:
        if not self.columns or not self.drop_values:
            return df
        pred = None
        for c in self.columns:
            col = F.col(c)
            keep = (~col.isin(self.drop_values)) | col.isNull()
            pred = keep if pred is None else (pred & keep)
        return df.filter(pred)
