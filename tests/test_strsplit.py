"""Ported from /root/reference/dfpipeline/tests/test_strsplit.py."""
import pandas as pd

import dataframe_pipeline_spark as dfp
from tests.conftest import assert_frames_equal

BASE = {
    "Email": ["taro.jp.com", "alice.us.com", "bob.us"],
    "ID": ["abcd", "klmn", "wxyz"],
}


def _df(spark):
    return spark.createDataFrame(pd.DataFrame(BASE))


def test_split_prefix(spark):
    s = dfp.StringSplitter(inputs=["Email"], outputs=["Email_prefix"], separator=".", keep=0)
    out = s.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "Email_prefix": ["taro", "alice", "bob"]}))


def test_split_suffix(spark):
    s = dfp.StringSplitter(inputs=["Email"], outputs=["Email_suffix"], separator=".", keep=-1)
    out = s.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "Email_suffix": ["com", "com", "us"]}))


def test_index_split_prefix(spark):
    s = dfp.StringSplitter(inputs=["ID"], outputs=["ID_prefix"], index=2, keep=0)
    out = s.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "ID_prefix": ["ab", "kl", "wx"]}))


def test_index_split_suffix(spark):
    s = dfp.StringSplitter(inputs=["ID"], outputs=["ID_suffix"], index=2, keep=-1)
    out = s.fit_transform(_df(spark))
    assert_frames_equal(out, pd.DataFrame({**BASE, "ID_suffix": ["cd", "mn", "yz"]}))
