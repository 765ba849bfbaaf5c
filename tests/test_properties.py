"""Property-based differential tests: random small frames through our
Spark operators must match the reference *semantics* computed with plain
pandas formulas (NaN→NULL normalized).  Beyond the reference's own test
suite, which is golden-frame only (SURVEY.md §5)."""

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(max_examples=10, deadline=None,
               suppress_health_check=list(HealthCheck))

floats = st.lists(
    st.one_of(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
              st.just(float("nan"))),
    min_size=2, max_size=12)

cats = st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=12)


def _spark_floats(spark, xs):
    return spark.createDataFrame(
        pd.DataFrame({"i": range(len(xs)), "x": pd.array(xs, dtype="float64")}))


def _col(df, name):
    return {r["i"]: r[name] for r in df.collect()}


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    return round(v, 9)


@given(edges=st.lists(
    st.tuples(st.integers(min_value=0, max_value=14),
              st.integers(min_value=0, max_value=14)),
    min_size=1, max_size=30))
@SET
def test_connected_components_matches_union_find(spark, edges):
    """dedup.connected_components (r8 checkpoint/convergence rewrite)
    vs a plain-Python union-find with min-id canonical labels, on
    random multigraphs with self-loops and duplicate edges."""
    from dataframe_pipeline_spark.dedup import connected_components

    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long")
    got = {r["node"]: r["comp"]
           for r in connected_components(pairs).collect()}

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@given(edges=st.lists(
    st.tuples(st.integers(min_value=0, max_value=9),
              st.integers(min_value=0, max_value=9)),
    min_size=1, max_size=25), iters=st.integers(min_value=1, max_value=4))
@SET
def test_pagerank_matches_python_reference(spark, edges, iters):
    """graph.pagerank (r8 adjacency rework) vs a dict-based Python
    replay of the same N-scaled fixed-iteration update on random
    directed multigraphs (duplicate edges must collapse)."""
    from dataframe_pipeline_spark.graph import pagerank

    e = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long")
    got = {r["id"]: r["pr"] for r in pagerank(e, iters=iters).collect()}

    dedup = sorted(set(edges))
    out: dict = {}
    for a, b in dedup:
        out.setdefault(a, []).append(b)
    nodes = {n for ab in dedup for n in ab}
    pr = {n: 1.0 for n in nodes}
    for _ in range(iters):
        contrib = {}
        for a, ds in out.items():
            w = pr[a] / len(ds)
            for b in ds:
                contrib[b] = contrib.get(b, 0.0) + w
        pr = {n: 0.15 + 0.85 * contrib.get(n, 0.0) for n in nodes}
    assert set(got) == nodes
    for n in nodes:
        assert got[n] == pytest.approx(pr[n], rel=1e-9, abs=1e-12)


@given(xs=floats)
@SET
def test_scaler_minmax_matches_sklearn_formula(spark, xs):
    from dataframe_pipeline_spark import Scaler

    sdf = _spark_floats(spark, xs)
    out = _col(Scaler(inputs=["x"], outputs=["y"], strategy="minmax")
               .fit_transform(sdf), "y")
    s = pd.Series(xs)
    rng = s.max() - s.min()
    exp = (s - s.min()) * (1.0 / rng) if rng != 0 else s * 0.0
    for i, v in enumerate(xs):
        assert _norm(out[i]) == _norm(None if math.isnan(v) else exp[i])


@given(xs=floats)
@SET
def test_imputer_mean_transform_time(spark, xs):
    from dataframe_pipeline_spark import Imputer

    sdf = _spark_floats(spark, xs)
    out = _col(Imputer(inputs=["x"], outputs=["y"], strategy="mean")
               .fit_transform(sdf), "y")
    mean = pd.Series(xs).mean()   # pandas skips NaN
    for i, v in enumerate(xs):
        if math.isnan(v):
            if pd.isna(mean):     # all-NaN column stays missing
                assert _norm(out[i]) is None
            else:
                # Spark's avg and pandas' mean legitimately differ in
                # the last ulp (different summation order); a 9-decimal
                # round can land on different sides of the boundary, so
                # compare the IMPUTED cells relatively (hypothesis
                # found -333333.4444444245 vs ...4244 flipping _norm).
                assert math.isclose(out[i], mean, rel_tol=1e-12)
        else:
            assert _norm(out[i]) == _norm(v)


@given(vals=cats)
@SET
def test_frequency_encoder_counts(spark, vals):
    from dataframe_pipeline_spark import FrequencyEncoder

    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "c": vals}))
    out = _col(FrequencyEncoder(inputs=["c"], outputs=["f"])
               .fit_transform(sdf), "f")
    counts = pd.Series(vals).value_counts()
    for i, v in enumerate(vals):
        assert out[i] == counts[v]


@given(vals=cats, thresh=st.integers(min_value=1, max_value=5))
@SET
def test_minority_threshold(spark, vals, thresh):
    from dataframe_pipeline_spark import MinorityTransformer

    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "c": vals}))
    out = _col(MinorityTransformer(inputs=["c"], outputs=["g"],
                                   threshold=thresh, replaced_to="OTHER")
               .fit_transform(sdf), "g")
    counts = pd.Series(vals).value_counts()
    for i, v in enumerate(vals):
        assert out[i] == (v if counts[v] >= thresh else "OTHER")


@given(vals=cats)
@SET
def test_label_encoder_sorted_order(spark, vals):
    from dataframe_pipeline_spark import ComplementLabelEncoder

    sdf = spark.createDataFrame(
        pd.DataFrame({"i": range(len(vals)), "c": vals}))
    out = _col(ComplementLabelEncoder(inputs=["c"], outputs=["e"])
               .fit_transform(sdf), "e")
    classes = sorted(set(vals) | {"extra_category_"})
    for i, v in enumerate(vals):
        assert out[i] == classes.index(v)


# -- codec round-trip properties (no Spark session needed) -----------------

img_arrays = st.tuples(
    st.integers(min_value=1, max_value=9),    # H
    st.integers(min_value=1, max_value=9),    # W
    st.integers(min_value=0, max_value=4),    # PNG filter type
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
)


@given(p=img_arrays)
@SET
def test_png_roundtrip_property(p):
    """encode_png(any HxWx3 array, any filter) decodes to the exact
    array — every filter path, every shape."""
    from dataframe_pipeline_spark.multimodal import (
        decode_image_array, encode_png)

    h, w, ft, seed = p
    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_image_array(encode_png(img, filter_type=ft))
    assert out.shape == (h, w, 3)
    assert (out == img).all()


@given(p=img_arrays)
@SET
def test_bmp_roundtrip_property(p):
    from dataframe_pipeline_spark.multimodal import (
        decode_image_array, encode_bmp)

    h, w, _ft, seed = p
    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_image_array(encode_bmp(img))
    # BMP stores BGR, but decode normalizes every format to RGB, so the
    # round-trip is the identity
    assert (out == img).all()


@given(n=st.integers(min_value=1, max_value=2000),
       seed=st.integers(min_value=0, max_value=2**31 - 1),
       rate=st.sampled_from([4000, 8000, 44100]))
@SET
def test_wav_roundtrip_property(n, seed, rate):
    from dataframe_pipeline_spark.multimodal import decode_audio, encode_wav

    samples = np.random.RandomState(seed).randint(
        -32768, 32767, size=n, dtype=np.int16)
    nch, sr, nf, dur, rms = decode_audio(encode_wav(samples, sample_rate=rate))
    assert (nch, sr, nf) == (1, rate, n)
    assert dur == n / rate
    exp_rms = float(np.sqrt(((samples / 32768.0) ** 2).mean()))
    assert abs(rms - exp_rms) < 1e-12


# -- codec properties (r5): random images through the pure-python codecs --

@SET
@given(st.integers(1, 24), st.integers(1, 24), st.integers(2, 12),
       st.integers(0, 2**32 - 1))
def test_gif_roundtrip_lossless_property(h, w, ncolors, seed):
    from dataframe_pipeline_spark.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    img = pal[rng.randint(0, ncolors, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


@SET
@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32 - 1))
def test_jpeg_roundtrip_bounded_error_property(h, w, seed):
    from dataframe_pipeline_spark.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    # smooth-ish image: quantization error stays tightly bounded
    base = rng.randint(60, 196)
    img = np.clip(base + rng.randint(-8, 9, (h, w, 3)), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 6


@SET
@given(st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-2**62, 2**62)),
        st.one_of(st.none(),
                  st.floats(allow_nan=True, allow_infinity=True,
                            width=64)),
        st.one_of(st.none(), st.text(max_size=12)),
    ), min_size=1, max_size=5))
def test_local_rows_df_matches_createdataframe_property(spark, rows):
    """Inline-VALUES rendering must agree with the Python-RDD path for
    arbitrary scalars (incl. NaN/inf/quotes/unicode/NULL)."""
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    from dataframe_pipeline_spark.serving import local_rows_df

    schema = StructType([StructField("i", LongType()),
                         StructField("x", DoubleType()),
                         StructField("s", StringType())])
    got = local_rows_df(spark, rows, schema).collect()
    exp = spark.createDataFrame(rows, schema).collect()

    def norm(rs):
        out = []
        for r in rs:
            x = r["x"]
            out.append((r["i"], "nan" if (x is not None and x != x) else x,
                        r["s"]))
        return out

    assert norm(got) == norm(exp)


@given(xs=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                             allow_nan=False),
                   min_size=1, max_size=40),
       qs=st.lists(st.floats(min_value=0.0, max_value=1.0),
                   min_size=1, max_size=4))
@SET
def test_exact_percentiles_matches_percentile(spark, xs, qs):
    """base.exact_percentiles must equal Spark's exact percentile()
    bit-for-bit on arbitrary data and quantile points — including
    duplicate-heavy lists and q on the 0/1 boundaries."""
    from pyspark.sql import functions as F

    from dataframe_pipeline_spark.base import exact_percentiles

    # duplicate-heavy variant: repeat the first value many times
    data = xs + [xs[0]] * 15
    sdf = spark.createDataFrame(pd.DataFrame({"x": data}))
    got = exact_percentiles(sdf, [F.col("x")], [list(qs)])[0]
    want = [float(v) for v in sdf.agg(F.percentile(
        "x", F.array(*[F.lit(q) for q in qs]))).collect()[0][0]]
    assert got == want


@given(c=st.integers(min_value=0, max_value=10**13),
       d=st.integers(min_value=0, max_value=99))
@SET
def test_integer_cents_formulation_is_exact(c, d):
    """The r10 gated cents fast path's exactness claim, as a property:
    for ANY positive 2-dp money value (c cents, up to 10^11 dollars —
    far past the overflow gate's own bound) the pure-double
    ``(x*100 + 0.5) -> long`` recovery returns exactly c (float64
    error at 10^13 is ~0.005, under the 0.5 guard), and the long
    product cents*(100-disc_pct) equals the exact rational
    price*(1-disc)*10^4 — i.e. the fast path computes the same number
    the decimal(18,2) multiply-sum computes, term by term."""
    from fractions import Fraction

    price = c / 100.0                       # the parquet double
    cents = int(price * 100.0 + 0.5)        # Spark: (col*100+0.5) cast long
    assert cents == c
    disc = d / 100.0
    dpct = int(disc * 100.0 + 0.5)
    assert dpct == d
    rev4 = cents * (100 - dpct)
    assert Fraction(rev4, 10**4) == \
        Fraction(c, 100) * (1 - Fraction(d, 100))


def test_integer_cents_matches_decimal_sum_on_frame(spark):
    """Same claim end-to-end through Spark codegen: the long-cents sum
    finished by one decimal divide equals the decimal(18,2)
    multiply-sum, on a frame that includes the rounding-hostile cases
    (x.x5 cents, large magnitudes)."""
    from pyspark.sql import functions as F

    from dataframe_pipeline_spark.ext_queries import _cents, _dec, _fin4

    rows = [(c / 100.0, d / 100.0)
            for c in [1, 5, 99, 105, 1005, 123456789012, 10**13 - 7]
            for d in [0, 5, 7, 99]]
    df = spark.createDataFrame(rows, "l_extendedprice double, l_discount double")
    fast = df.agg(_fin4(F.sum(_cents("l_extendedprice")
                               * (F.lit(100) - _cents("l_discount"))))
                  .alias("v")).head()["v"]
    slow = df.agg(F.sum(_dec("l_extendedprice")
                        * (F.lit(1).cast("decimal(18,2)")
                           - _dec("l_discount")))
                  .cast("double").alias("v")).head()["v"]
    assert fast == slow
