"""NumPy-flavored scalar helpers that operate on pyspark Columns.

The reference's bytecode compiler understands the numpy/builtin calls
``sqrt abs ceil exp floor log min max mean power str timedelta isnan
lower log1p expm1`` (/root/reference/dfpipeline/walkBytecode.py:55-71).
Lambdas written against *this* module instead of numpy stay on the native
Column fast path of :class:`FunctionTransformer` — every helper returns a
Column expression that whole-stage codegen compiles, no Python at runtime.

They also accept plain Python scalars/pandas Series transparently (falling
back to numpy) so the same lambda works in both tiers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "sqrt", "abs", "absolute", "ceil", "exp", "floor", "log", "log1p",
    "expm1", "power", "minimum", "maximum", "where", "isnan", "lower",
]

_py_abs = abs


def _is_col(x) -> bool:
    return isinstance(x, Column)


def _unary(spark_fn, np_name):
    def fn(x):
        if _is_col(x):
            return spark_fn(x)
        import numpy as np

        return getattr(np, np_name)(x)

    fn.__name__ = np_name
    return fn


sqrt = _unary(F.sqrt, "sqrt")
ceil = _unary(F.ceil, "ceil")
exp = _unary(F.exp, "exp")
floor = _unary(F.floor, "floor")
log = _unary(F.log, "log")
log1p = _unary(F.log1p, "log1p")
expm1 = _unary(F.expm1, "expm1")
isnan = _unary(F.isnan, "isnan")


def abs(x):  # noqa: A001 - numpy-compatible name
    if _is_col(x):
        return F.abs(x)
    return _py_abs(x)


absolute = abs


def lower(x):
    if _is_col(x):
        return F.lower(x)
    return x.lower()


def power(x, y):
    if _is_col(x) or _is_col(y):
        return F.pow(x, y)
    import numpy as np

    return np.power(x, y)


def minimum(x, y):
    if _is_col(x) or _is_col(y):
        return F.least(x if _is_col(x) else F.lit(x), y if _is_col(y) else F.lit(y))
    import numpy as np

    return np.minimum(x, y)


def maximum(x, y):
    if _is_col(x) or _is_col(y):
        return F.greatest(x if _is_col(x) else F.lit(x), y if _is_col(y) else F.lit(y))
    import numpy as np

    return np.maximum(x, y)


def where(cond, a, b):
    """Vectorized if/else — the Column analog of the reference's ONNX ``If``
    diamond reconstruction (walkBytecode.py:477-558)."""
    if _is_col(cond):
        return F.when(cond, a).otherwise(b)
    import numpy as np

    return np.where(cond, a, b)
