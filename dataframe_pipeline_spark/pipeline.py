"""DataframePipeline — ordered steps with fit/transform over Spark DataFrames.

API parity with the reference driver
(/root/reference/dfpipeline/DataframePipeline.py:306-381): ``steps=`` list,
``append``/``clear``, ``fit``, ``transform``, ``fit_transform``, and the
``input_columns`` / ``input_dtypes`` / ``output_columns`` snapshots.

Execution model difference (deliberate): the reference mutates one pandas
frame step-by-step, eagerly.  Here each step contributes Column expressions
to a single *lazy* Catalyst plan; nothing executes until an action at the
sink.  Steps whose fit-state requires data statistics (encoders, scalers)
trigger their own small aggregate jobs inside ``fit``; transform itself
stays fully lazy.

Reference quirk replicated exactly: ``fit`` (without transform) fits every
step against the *original* input frame — it does NOT thread the transformed
frame through (DataframePipeline.py:322-334).  ``fit_transform`` does thread
it (DataframePipeline.py:359-381).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class DataframePipeline:
    def __init__(self, steps=None):
        self.steps = list(steps) if steps is not None else []
        self.input_columns = None
        self.input_dtypes = None
        self.output_columns = None

    def clear(self) -> None:
        self.steps = []

    def append(self, step) -> None:
        self.steps.append(step)

    def fit(self, df: DataFrame, **kwargs) -> "DataframePipeline":
        for i, tr in enumerate(self.steps):
            self.steps[i] = tr.fit(df, **kwargs)
        return self

    def transform(self, df: DataFrame) -> DataFrame:
        X = df
        self.input_columns = list(X.columns)
        self.input_dtypes = {f.name: f.dataType for f in X.schema.fields}
        for tr in self.steps:
            X = tr.transform(X)
        self.output_columns = list(X.columns)
        return X

    def fit_transform(self, df: DataFrame, **kwargs) -> DataFrame:
        X = df
        self.input_columns = list(X.columns)
        self.input_dtypes = {f.name: f.dataType for f in X.schema.fields}
        for i, tr in enumerate(self.steps):
            self.steps[i] = tr.fit(X, **kwargs)
            X = self.steps[i].transform(X)
        self.output_columns = list(X.columns)
        return X

    def explain(self, df: DataFrame, mode: str = "formatted") -> None:
        """Show the Catalyst physical plan of the whole fitted pipeline."""
        self.transform(df).explain(mode)

    def save(self, path: str) -> None:
        """Persist the fitted pipeline (the reference's ``export`` analog:
        fit once, score anywhere — see persistence.py)."""
        from .persistence import save_pipeline

        save_pipeline(self, path)

    @classmethod
    def load(cls, spark, path: str) -> "DataframePipeline":
        from .persistence import load_pipeline

        return load_pipeline(spark, path)
