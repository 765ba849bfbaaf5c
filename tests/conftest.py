import math
import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from dataframe_pipeline_spark.session import get_spark

    s = get_spark("dfp-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "4")))
    yield s
    s.stop()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, float):
        return round(v, 9)
    return v


def assert_frames_equal(result_df, expected: pd.DataFrame, sort_by=None, check_order=False):
    """Golden-frame compare: Spark result vs expected pandas frame.

    NaN is normalized to None, floats rounded to 9 places, rows compared
    order-insensitively (sorted by all columns) unless check_order=True —
    matching the driver's oracle comparison discipline.
    """
    got = result_df.toPandas()
    assert list(got.columns) == list(expected.columns), (
        f"columns differ: {list(got.columns)} vs {list(expected.columns)}"
    )
    g = [tuple(_norm_cell(v) for v in row) for row in got.itertuples(index=False)]
    e = [tuple(_norm_cell(v) for v in row) for row in expected.itertuples(index=False)]
    if not check_order:
        def cell_key(x):
            if x is None:
                return (2, "")
            if isinstance(x, (int, float)) and not isinstance(x, bool):
                return (0, float(x))
            return (1, str(x))

        key = lambda t: tuple(cell_key(x) for x in t)
        g, e = sorted(g, key=key), sorted(e, key=key)
    assert g == e, f"rows differ:\n got: {g}\n exp: {e}"
