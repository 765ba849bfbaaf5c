"""SetTransformer — set algebra between column value-sets and/or literals.

Reference: /root/reference/dfpipeline/SetTransformer.py — operands are a
column label (→ the set of its values), a literal list, or a callable
returning either; operations ``* &`` (intersection), ``+ |`` (union),
``-`` (difference).  The result list is handed to ``output_func`` and
padded with None into a column of the input frame.

Spark-first: the set algebra runs distributed — ``select(col).distinct()``
vs a literal one-column DataFrame, combined with ``intersect`` / ``union +
distinct`` / ``exceptAll→distinct`` — so a 100 TB column never touches the
driver; only the (small, distinct) result is collected for the callback /
padded-column contract.  Python ``set`` iteration order is arbitrary, so
the result is sorted for determinism (the reference's order is undefined).

``as_dataframe(df)`` is the scale-native surface: returns the result as a
one-column DataFrame without any driver materialization.
"""

from __future__ import annotations

import types

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..base import SparkDFPBase, literal_df


class SetTransformer(SparkDFPBase):
    def __init__(self, first_operand=None, second_operand=None, output_operand=None,
                 output_func=None, set_operation=None):
        self.first_operand = first_operand
        self.second_operand = second_operand
        self.output_operand = output_operand
        self.output_func = output_func
        self.set_operation = set_operation

    @classmethod
    def is_method(cls, m):
        return isinstance(m, (types.FunctionType, types.MethodType, types.LambdaType))

    def _operand_df(self, df: DataFrame, op) -> DataFrame:
        op = op() if self.is_method(op) else op
        if isinstance(op, str):
            return df.select(F.col(op).cast("string").alias("__dfp_v")).distinct()
        return literal_df(df.sparkSession, [str(x) for x in op], "__dfp_v").distinct()

    def result_df(self, df: DataFrame) -> DataFrame:
        """The set-operation result as a one-column DataFrame (scale path)."""
        first = self._operand_df(df, self.first_operand)
        second = self._operand_df(df, self.second_operand)
        if self.set_operation in ("*", "&"):
            return first.intersect(second)
        if self.set_operation in ("+", "|"):
            return first.union(second).distinct()
        if self.set_operation == "-":
            return first.exceptAll(second).distinct()
        raise ValueError(f"Unknown set operation {self.set_operation!r}")

    def transform(self, df: DataFrame) -> DataFrame:
        if (self.first_operand is None or self.second_operand is None
                or self.set_operation is None or self.output_func is None):
            return df
        result = sorted(r["__dfp_v"] for r in self.result_df(df).collect())
        self.output_func(result)

        # Pad into a column: attach by row position (the reference assigns
        # the list positionally).  Positional padding is a parity-tier
        # surface — row order is only meaningful relative to the current
        # partition layout; use ``result_df()`` as the scale-native
        # output.  Row ids come from the zipWithIndex pattern: one tiny
        # per-partition count job, then offset[pid] + a partition-LOCAL
        # row_number — no global single-partition sort anywhere.
        # The pid-stamped frame is eagerly localCheckpoint-ed so the
        # count job and the position-assignment job read the SAME
        # materialized partition layout — lineage re-execution (a
        # non-deterministic source, AQE re-coalescing between the two
        # plans) can otherwise shift the pid→offset map and silently
        # mis-assign positions.
        keyed = df.withColumn(
            "__dfp_pid", F.spark_partition_id()).localCheckpoint(eager=True)
        counts = keyed.groupBy("__dfp_pid").count().collect()
        offsets, n = {}, 0
        for r in sorted(counts, key=lambda r: r["__dfp_pid"]):
            offsets[r["__dfp_pid"]] = n
            n += r["count"]
        if len(result) > n:
            raise AssertionError(
                f"The length of the result is longer than that of DataFrame. "
                f"len(result)={len(result)} len(df)={n}"
            )
        res_df = df.sparkSession.range(1).select(
            F.posexplode(F.array(*[F.lit(v).cast("string") for v in result]))
            .alias("__dfp_pos", "__dfp_v")
        ).withColumn("__dfp_pos", F.col("__dfp_pos").cast("long"))
        off = F.create_map(
            *[F.lit(v) for kv in sorted(offsets.items()) for v in kv]) \
            if offsets else F.create_map(F.lit(0), F.lit(0).cast("long"))
        w = Window.partitionBy("__dfp_pid").orderBy(
            F.monotonically_increasing_id())
        df = (
            keyed
            .withColumn("__dfp_pos",
                        (off[F.col("__dfp_pid")]
                         + F.row_number().over(w) - 1).cast("long"))
            .join(F.broadcast(res_df), on="__dfp_pos", how="left")
            .withColumn(self.output_operand, F.col("__dfp_v"))
            .drop("__dfp_pid", "__dfp_pos", "__dfp_v")
        )
        return df
