"""Multimodal plumbing: binary payload metadata + Arrow-batched decode."""

import hashlib

import pytest

from dataframe_pipeline_spark import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "abc")], "doc_id long, text string")


def test_payload_metadata(docs):
    out = {r.doc_id: r for r in mm.with_payload_metadata(docs).collect()}
    assert bytes(out[0].payload) == b"hello world"
    assert out[0].n_bytes == 11
    assert out[0].digest == hashlib.sha256(b"hello world").hexdigest()[:16]


def test_fake_decoder_schema_and_values(docs):
    out = mm.FakeImageDecoder().transform(docs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "digest", "width", "height", "mean_pixel"]
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].width == 1 + ord("a") % 64
    assert r[1].height == 1 + ord("c") % 64
    assert r[1].mean_pixel == pytest.approx(sum(b"abc") / 3)


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_fake_resizer_shape(spark):
    from dataframe_pipeline_spark import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "hello world this is long"), (1, "x")], "doc_id long, text string")
    out = mm.FakeResizer(width=4, height=2).transform(docs).collect()
    by_id = {r.doc_id: r for r in out}
    assert all(r.out_bytes == 8 for r in out)
    assert bytes(by_id[0].resized) == b"hello wo"
    assert bytes(by_id[1].resized) == b"x" + b"\0" * 7


def test_fake_frame_sampler_explodes(spark):
    from dataframe_pipeline_spark import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "a" * 64)], "doc_id long, text string")   # 64 bytes / 16 = 4 chunks
    out = mm.FakeFrameSampler(chunk=16, stride=2).transform(docs).collect()
    assert [(r.frame_no, len(bytes(r.frame))) for r in out] == [(0, 16), (2, 16)]


def test_decode_stubs_raise():
    import pytest as _pytest
    from dataframe_pipeline_spark import multimodal as mm

    with _pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00")
    with _pytest.raises(NotImplementedError):
        mm.resize_image(b"\x00", 2, 2)
