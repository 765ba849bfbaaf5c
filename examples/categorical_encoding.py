"""CategoricalEncoding1-shaped pipeline over the synthetic part table.

Re-expresses /root/reference/benchmarks/categorical_encoding_1/
CategoricalEncoding1.py:70-86: dict maps to ordinals, a `x - 1` lambda,
label-encoding, standard scaling, suffix-keeping string splits, one-hot
expansion, and a final drop of the raw categorical columns.
"""

from _runner import run

import dataframe_pipeline_spark as dfp


def build(df):
    return dfp.DataframePipeline(steps=[
        # ord_1/ord_2-style ordinal dict map
        dfp.MapTransformer(inputs=["p_size"], outputs=["size_ord"],
                           dict={1: 0, 2: 1, 3: 2}, default_value=3),
        # bin_0 lambda
        dfp.FunctionTransformer(inputs=["p_partkey"], outputs=["key0"],
                                func=lambda x: x - 1),
        dfp.ComplementLabelEncoder(inputs=["p_type"], outputs=["type_id"]),
        dfp.Scaler(inputs=["p_retailprice"], outputs=["p_retailprice"],
                   strategy="standard"),
        # nom_5-style suffix-keeping splits
        dfp.StringSplitter(inputs=["p_name"], outputs=["name_sfx"],
                           index=8, keep=-1),
        dfp.StringSplitter(inputs=["p_type"], outputs=["type_sfx"],
                           index=3, keep=-1),
        dfp.OneHotEncoder(columns=["p_brand"]),
        dfp.ColumnSelector(columns=["p_name", "p_type", "p_brand"], drop=True),
    ])


if __name__ == "__main__":
    run("categorical_encoding", build, table="part")
