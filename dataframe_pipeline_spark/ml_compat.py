"""pyspark.ml compatibility: run our operators inside MLlib Pipelines.

``as_ml_stage(op)`` wraps any of this package's fit/transform operators
as a ``pyspark.ml.Estimator`` whose fitted result is a
``pyspark.ml.Model`` — so the stock ``pyspark.ml.Pipeline`` driver
(fit threads each stage's transform into the next stage's fit, exactly
like our ``DataframePipeline.fit_transform``) and the broader MLlib
ecosystem (CrossValidator, ParamGridBuilder composition points) can
host them.  The reference is a scikit-learn-pipeline clone; this is the
same contract expressed in Spark's own pipeline vocabulary.
"""

from __future__ import annotations

from pyspark.ml import Estimator, Model, Pipeline


class DFPModel(Model):
    """Fitted wrapper: delegates transform to the fitted operator."""

    def __init__(self, op=None):
        super().__init__()
        self.op = op

    def _transform(self, dataset):
        return self.op.transform(dataset)


class DFPStage(Estimator):
    """Estimator wrapper: delegates fit to the wrapped operator."""

    def __init__(self, op=None):
        super().__init__()
        self.op = op

    def _fit(self, dataset):
        return DFPModel(self.op.fit(dataset))


def as_ml_stage(op) -> DFPStage:
    return DFPStage(op)


def as_ml_pipeline(steps) -> Pipeline:
    """An MLlib Pipeline over this package's operators (or a
    DataframePipeline's ``steps`` list)."""
    steps = getattr(steps, "steps", steps)
    return Pipeline(stages=[as_ml_stage(op) for op in steps])
