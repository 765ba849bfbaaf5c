"""AST → Column lambda compiler.

The reference's distinctive feature is a CPython-bytecode → ONNX compiler
for restricted Python lambdas (/root/reference/dfpipeline/walkBytecode.py:
34-130 op tables, :477-558 if/else diamonds, :591-607 log1p/expm1 fusion,
:641-664 split-subscript).  The Spark-first analog translates the lambda's
*AST* into a native Column expression, so the same restricted surface —
arithmetic, comparisons, and/or/not, if/else, ``in``/``is``, numpy/math
calls, ``str.lower``, ``split()[i]`` — runs inside whole-stage codegen
with zero Python at execution time.

``compile_lambda(func, {arg: Column})`` returns a Column or None (any
unsupported construct → None, caller falls back to a pandas UDF).
Plain-Python subtrees are constant-folded eagerly; closure/global names
resolve to literals at compile time — the exact analog of the reference
baking fitted scalars into the ONNX graph.
"""

from __future__ import annotations

import ast
import builtins
import datetime as _dt
import inspect
import math
import re
import statistics
import textwrap

from pyspark.sql import Column
from pyspark.sql import functions as F

try:
    import numpy as np
except ImportError:  # pragma: no cover
    np = None


def _args_seq(a):
    """min/max/mean accept either varargs or one list/tuple argument."""
    if len(a) == 1 and isinstance(a[0], (list, tuple)):
        return list(a[0])
    return list(a)


def _nary_mean(*a):
    """Elementwise n-ary mean — the walkBytecode 'mean' → ONNX Mean
    analog (/root/reference/dfpipeline/walkBytecode.py:66): sum the
    operands, divide by their count (float division, like ONNX Mean)."""
    xs = _args_seq(a)
    acc = _lit(xs[0])
    for x in xs[1:]:
        acc = acc + _lit(x)
    return acc / float(len(xs))


def _func_map():
    m = {
        abs: F.abs,
        min: lambda *a: F.least(*[_lit(x) for x in _args_seq(a)]),
        max: lambda *a: F.greatest(*[_lit(x) for x in _args_seq(a)]),
        statistics.mean: _nary_mean,
        pow: F.pow,
        round: F.round,
        len: F.length,
        str: lambda c: c.cast("string"),
        float: lambda c: c.cast("double"),
        int: lambda c: c.cast("long"),
        bool: lambda c: c.cast("boolean"),
        str.lower: F.lower,
        str.upper: F.upper,
        str.strip: F.trim,
        math.sqrt: F.sqrt,
        math.floor: F.floor,
        math.ceil: F.ceil,
        math.exp: F.exp,
        math.log: F.log,
        math.log1p: F.log1p,
        math.expm1: F.expm1,
        math.pow: F.pow,
        math.isnan: F.isnan,
    }
    if np is not None:
        m.update({
            np.sqrt: F.sqrt, np.abs: F.abs, np.absolute: F.abs,
            np.ceil: F.ceil, np.exp: F.exp, np.floor: F.floor,
            np.log: F.log, np.log1p: F.log1p, np.expm1: F.expm1,
            np.power: F.pow, np.isnan: F.isnan,
            np.minimum: lambda a, b: F.least(_lit(a), _lit(b)),
            np.maximum: lambda a, b: F.greatest(_lit(a), _lit(b)),
            np.where: lambda c, a, b: F.when(c, _lit(a)).otherwise(_lit(b)),
            np.mean: _nary_mean,
        })
    return m


class _TimeDelta:
    """Compile-time marker for a ``datetime.timedelta(...)`` whose
    components involve Columns (walkBytecode 'timedelta' → TimeDelta,
    /root/reference/dfpipeline/walkBytecode.py:68,401).  Carries the
    total span in (possibly fractional) seconds as a Column expression;
    anchored to a datetime by ``_Compiler._td_binop``."""

    __slots__ = ("seconds",)

    def __init__(self, seconds):
        self.seconds = seconds


_TD_POSITIONAL = ("days", "seconds", "microseconds", "milliseconds",
                  "minutes", "hours", "weeks")
_TD_FACTORS = {"weeks": 604800.0, "days": 86400.0, "hours": 3600.0,
               "minutes": 60.0, "seconds": 1.0, "milliseconds": 1e-3,
               "microseconds": 1e-6}


def _lit(v):
    return v if isinstance(v, Column) else F.lit(v)


def _is_col(*vals) -> bool:
    flat = []
    for v in vals:
        flat.extend(v) if isinstance(v, (list, tuple)) else flat.append(v)
    return any(isinstance(v, (Column, _TimeDelta)) for v in flat)


class _Unsupported(Exception):
    pass


def _candidate_trees(src: str):
    """Parse attempts for lambda source fragments.

    ``inspect.getsource`` on an inline lambda returns its *line(s)* —
    often an invalid fragment like ``func=lambda x: x + 1),``.  Besides
    the raw parse, try every ``lambda`` occurrence with the longest
    suffix-trimmed fragment that parses in eval mode."""
    try:
        yield ast.parse(src)
    except SyntaxError:
        pass
    for m in re.finditer(r"\blambda\b", src):
        frag = src[m.start():].rstrip()
        for end in range(len(frag), 7, -1):
            try:
                yield ast.parse(frag[:end], mode="eval")
                break
            except SyntaxError:
                continue


def _find_lambda_ast(func):
    """Parse the defining source and locate this lambda/def's AST node."""
    try:
        src = textwrap.dedent(inspect.getsource(func))
    except (OSError, TypeError):
        return None
    want = func.__code__.co_varnames[:func.__code__.co_argcount]
    hits: dict[str, ast.expr] = {}
    for tree in _candidate_trees(src):
        for node in ast.walk(tree):
            if isinstance(node, ast.Lambda):
                args = tuple(a.arg for a in node.args.args)
                if args == want:
                    hits.setdefault(ast.dump(node.body), node.body)
            elif isinstance(node, ast.FunctionDef) and node.name == func.__name__:
                body = [s for s in node.body if not isinstance(s, ast.Expr)]
                if len(body) == 1 and isinstance(body[0], ast.Return):
                    hits.setdefault(ast.dump(body[0].value), body[0].value)
    if len(hits) != 1:   # zero or ambiguous (two different same-arg lambdas)
        return None
    return next(iter(hits.values()))


class _Compiler:
    _BIN = {
        ast.Add: lambda a, b: a + b, ast.Sub: lambda a, b: a - b,
        ast.Mult: lambda a, b: a * b, ast.Div: lambda a, b: a / b,
        ast.Mod: lambda a, b: a % b, ast.Pow: lambda a, b: a ** b,
    }
    _CMP = {
        ast.Eq: lambda a, b: a == b, ast.NotEq: lambda a, b: a != b,
        ast.Lt: lambda a, b: a < b, ast.LtE: lambda a, b: a <= b,
        ast.Gt: lambda a, b: a > b, ast.GtE: lambda a, b: a >= b,
    }

    def __init__(self, func, arg_cols):
        self.arg_cols = arg_cols
        self.globals = dict(vars(builtins))
        self.globals.update(getattr(func, "__globals__", {}))
        if func.__closure__:
            self.globals.update({
                n: cell.cell_contents for n, cell in
                zip(func.__code__.co_freevars, func.__closure__)
            })
        self.fmap = _func_map()

    # -- name/constant resolution -----------------------------------------
    def _name(self, node):
        if node.id in self.arg_cols:
            return self.arg_cols[node.id]
        if node.id in self.globals:
            return self.globals[node.id]
        raise _Unsupported(node.id)

    def _resolve_static(self, node):
        """Resolve a non-Column expression (module attr, constant) to a
        Python object at compile time."""
        if isinstance(node, ast.Name):
            return self._name(node)
        if isinstance(node, ast.Attribute):
            return getattr(self._resolve_static(node.value), node.attr)
        if isinstance(node, ast.Constant):
            return node.value
        raise _Unsupported(ast.dump(node))

    # -- expression evaluation --------------------------------------------
    def eval(self, node):
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Name):
            v = self._name(node)
            if isinstance(v, (Column, int, float, str, bool, type(None),
                              _dt.datetime, _dt.date, _dt.timedelta)):
                return v
            raise _Unsupported(f"name {node.id} of type {type(v)}")
        if isinstance(node, (ast.Tuple, ast.List)):
            return [self.eval(e) for e in node.elts]
        if isinstance(node, ast.BinOp):
            return self._binop(node)
        if isinstance(node, ast.UnaryOp):
            v = self.eval(node.operand)
            if isinstance(node.op, ast.USub):
                return -v
            if isinstance(node.op, ast.UAdd):
                return +v
            if isinstance(node.op, ast.Not):
                return ~v if _is_col(v) else (not v)
            raise _Unsupported(type(node.op).__name__)
        if isinstance(node, ast.Compare):
            return self._compare(node)
        if isinstance(node, ast.BoolOp):
            vals = [self.eval(v) for v in node.values]
            out = vals[0]
            for v in vals[1:]:
                if isinstance(node.op, ast.And):
                    out = (out & v) if _is_col(out, v) else (out and v)
                else:
                    out = (out | v) if _is_col(out, v) else (out or v)
            return out
        if isinstance(node, ast.IfExp):
            cond = self.eval(node.test)
            if not _is_col(cond):
                return self.eval(node.body if cond else node.orelse)
            return (F.when(cond, _lit(self.eval(node.body)))
                    .otherwise(_lit(self.eval(node.orelse))))
        if isinstance(node, ast.Call):
            return self._call(node)
        if isinstance(node, ast.Subscript):
            return self._subscript(node)
        raise _Unsupported(type(node).__name__)

    def _binop(self, node):
        # expm1 fusion: exp(x) - 1  (walkBytecode.py:591-607 analog)
        if isinstance(node.op, ast.Sub) and isinstance(node.left, ast.Call):
            try:
                target = self._resolve_static(node.left.func)
            except _Unsupported:
                target = None
            one = isinstance(node.right, ast.Constant) and node.right.value == 1
            if one and target in (math.exp, getattr(np, "exp", None)):
                arg = self.eval(node.left.args[0])
                if _is_col(arg):
                    return F.expm1(arg)
        a, b = self.eval(node.left), self.eval(node.right)
        if isinstance(a, _TimeDelta) or isinstance(b, _TimeDelta):
            return self._td_binop(node.op, a, b)
        try:
            op = self._BIN[type(node.op)]
        except KeyError:
            raise _Unsupported(type(node.op).__name__) from None
        return op(a, b)

    # -- timedelta arithmetic ----------------------------------------------
    @staticmethod
    def _epoch(d) -> float:
        """Seconds-since-epoch of a datetime/date constant; naive
        datetimes are UTC (the session timezone is pinned UTC)."""
        if isinstance(d, _dt.datetime):
            d = d.replace(tzinfo=_dt.timezone.utc) if d.tzinfo is None else d
            return d.timestamp()
        return _dt.datetime(d.year, d.month, d.day,
                            tzinfo=_dt.timezone.utc).timestamp()

    def _td_binop(self, op, a, b):
        """``anchor ± timedelta(cols)`` → TIMESTAMP expression; td+td and
        td*k stay symbolic.  Constant-datetime anchors compile to
        ``timestamp_seconds(epoch + secs)`` (pure codegen, exact to
        double precision); Column anchors add a day-time interval."""
        if isinstance(op, ast.Add):
            if isinstance(a, _TimeDelta) and isinstance(b, _TimeDelta):
                return _TimeDelta(a.seconds + b.seconds)
            base, td = (a, b) if isinstance(b, _TimeDelta) else (b, a)
            return self._anchor(base, td.seconds)
        if isinstance(op, ast.Sub) and isinstance(b, _TimeDelta) \
                and not isinstance(a, _TimeDelta):
            return self._anchor(a, -b.seconds)
        if isinstance(op, ast.Mult):
            td, k = (a, b) if isinstance(a, _TimeDelta) else (b, a)
            if not isinstance(k, _TimeDelta) and not isinstance(k, Column):
                return _TimeDelta(td.seconds * k)
        raise _Unsupported("timedelta arithmetic")

    def _anchor(self, base, secs):
        if isinstance(base, _dt.timedelta):
            return _TimeDelta(_lit(base.total_seconds()) + secs)
        if isinstance(base, _dt.datetime):
            return F.timestamp_seconds(F.lit(self._epoch(base)) + secs)
        if isinstance(base, _dt.date):
            # Python: date ± timedelta is a DATE, but the compiled
            # timestamp_seconds(...) would be a TIMESTAMP — a different
            # result type than the lambda (and than the UDF fallback
            # used when compilation bails).  The span here is always a
            # Column expression, so whole-day-ness is not statically
            # knowable — bail to the UDF fallback, which runs the
            # original lambda and preserves Python semantics exactly.
            raise _Unsupported("timedelta anchored to datetime.date")
        if isinstance(base, Column):
            return base + self._interval(secs)
        raise _Unsupported("timedelta anchored to non-datetime")

    @staticmethod
    def _interval(secs):
        from pyspark.sql.functions import make_dt_interval
        return make_dt_interval(secs=_lit(secs).cast("decimal(18,6)"))

    def _compare(self, node):
        if len(node.ops) != 1:  # chained comparisons: rare, bail
            raise _Unsupported("chained comparison")
        op, right = node.ops[0], node.comparators[0]
        left_v = self.eval(node.left)
        if isinstance(op, (ast.In, ast.NotIn)):
            seq = self._resolve_literal_seq(right)
            col = left_v if _is_col(left_v) else _lit(left_v)
            res = col.isin(list(seq))
            return ~res if isinstance(op, ast.NotIn) else res
        if isinstance(op, (ast.Is, ast.IsNot)):
            rv = self.eval(right)
            if rv is None and _is_col(left_v):
                return (left_v.isNotNull() if isinstance(op, ast.IsNot)
                        else left_v.isNull())
            raise _Unsupported("is against non-None")
        rv = self.eval(right)
        try:
            return self._CMP[type(op)](left_v, rv)
        except KeyError:
            raise _Unsupported(type(op).__name__) from None

    def _resolve_literal_seq(self, node):
        if isinstance(node, (ast.List, ast.Tuple, ast.Set)):
            return [self.eval(e) for e in node.elts]
        v = self._resolve_static(node)
        if isinstance(v, (list, tuple, set, frozenset)):
            return list(v)
        raise _Unsupported("in against non-literal")

    def _call(self, node):
        if node.keywords:
            # Only datetime.timedelta takes kwargs (the reference's
            # `START_DATE + timedelta(seconds=x)` idiom).
            if any(k.arg is None for k in node.keywords):
                raise _Unsupported("**kwargs")
            try:
                target = self._resolve_static(node.func)
            except _Unsupported:
                target = None
            if target is not _dt.timedelta:
                raise _Unsupported("kwargs in call")
            return self._timedelta(
                [self.eval(a) for a in node.args],
                {k.arg: self.eval(k.value) for k in node.keywords})
        # method call on a compiled Column: x.lower() / x.split(sep)
        if isinstance(node.func, ast.Attribute):
            try:
                obj = self.eval(node.func.value)
            except _Unsupported:
                obj = None
            if isinstance(obj, Column):
                return self._method(obj, node.func.attr,
                                    [self.eval(a) for a in node.args])
        target = self._resolve_static(node.func)
        # log1p fusion: log(1 + x)
        if (target in (math.log, getattr(np, "log", None))
                and len(node.args) == 1 and isinstance(node.args[0], ast.BinOp)
                and isinstance(node.args[0].op, ast.Add)):
            b = node.args[0]
            for one, x in ((b.left, b.right), (b.right, b.left)):
                if isinstance(one, ast.Constant) and one.value == 1:
                    arg = self.eval(x)
                    if _is_col(arg):
                        return F.log1p(arg)
        args = [self.eval(a) for a in node.args]
        if target is _dt.timedelta:
            return self._timedelta(args, {})
        if not _is_col(*args):            # pure-Python subtree: fold now
            return target(*args)
        try:
            builder = self.fmap[target]
        except (KeyError, TypeError):
            raise _Unsupported(getattr(target, "__name__", repr(target))) from None
        return builder(*args)

    def _timedelta(self, args, kwargs):
        parts = dict(zip(_TD_POSITIONAL, args))
        parts.update(kwargs)
        if set(parts) - set(_TD_FACTORS):
            raise _Unsupported("timedelta argument")
        if not _is_col(*parts.values()):       # pure constants: fold
            return _dt.timedelta(**parts)
        total = None
        for name, v in parts.items():
            f = _TD_FACTORS[name]
            term = _lit(v) if f == 1.0 else _lit(v) * f
            total = term if total is None else total + term
        return _TimeDelta(total)

    def _method(self, col: Column, name: str, args):
        if name == "lower" and not args:
            return F.lower(col)
        if name == "upper" and not args:
            return F.upper(col)
        if name == "strip" and not args:
            return F.trim(col)
        if name == "split" and len(args) == 1 and isinstance(args[0], str):
            return F.split(col, re.escape(args[0]))
        raise _Unsupported(f"method .{name}")

    def _subscript(self, node):
        # split(sep)[i] — the reference's split-subscript pattern
        base = self.eval(node.value)
        if not isinstance(base, Column):
            raise _Unsupported("subscript on non-Column")
        idx = self.eval(node.slice)
        if not isinstance(idx, int):
            raise _Unsupported("non-constant subscript")
        return F.element_at(base, idx + 1 if idx >= 0 else idx)


def compile_lambda(func, cols: list[Column]) -> Column | None:
    """Translate a restricted-Python lambda into a Column, or None.

    ``cols`` bind positionally to the function's parameters."""
    code = getattr(func, "__code__", None)
    if code is None or code.co_argcount != len(cols):
        return None
    arg_cols = dict(zip(code.co_varnames[:code.co_argcount], cols))
    body = _find_lambda_ast(func)
    if body is None:
        return None
    try:
        out = _Compiler(func, arg_cols).eval(body)
    except _Unsupported:
        return None
    except Exception:
        return None
    return out if isinstance(out, Column) else None
