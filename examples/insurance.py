"""Insurance1-shaped pipeline over the synthetic orders table.

Re-expresses /root/reference/benchmarks/insurance_1/Insurance1.py:69-74:
date expansion into calendar features, label-encoding of every string
column, then dropping the raw date + unused derived fields.
"""

from _runner import run

import dataframe_pipeline_spark as dfp


def build(df):
    cat_columns = [f.name for f in df.schema.fields
                   if f.dataType.simpleString() == "string"]
    return dfp.DataframePipeline(steps=[
        dfp.DateTransformer(column="o_orderdate"),
        dfp.ComplementLabelEncoder(inputs=cat_columns, outputs=cat_columns),
        dfp.ColumnSelector(
            columns=["o_orderdate", "o_orderdate_WY", "o_orderdate_DY",
                     "o_orderdate_DM", "o_orderdate_HD"],
            drop=True),
    ])


if __name__ == "__main__":
    run("insurance", build, table="orders")
