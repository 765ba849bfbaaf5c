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
