from .aggregator import Aggregator
from .column_selector import ColumnSelector
from .date_transformer import DateTransformer
from .frequency_encoder import FrequencyEncoder
from .function_transformer import FunctionTransformer
from .imputer import Imputer
from .label_encoder import ComplementLabelEncoder
from .map_transformer import MapTransformer
from .minority_transformer import MinorityTransformer
from .onehot_encoder import OneHotEncoder
from .outlier_clipper import OutlierClipper
from .quantile_binner import QuantileBinner
from .target_encoder import (CVTargetEncoder, HashingEncoder,
                             TargetEncoder)
from .range_transformer import RangeTransformer
from .row_transformer import RowTransformer
from .scaler import Scaler
from .set_transformer import SetTransformer
from .string_ops import StringConcatenator, StringSplitter
from .type_converter import TypeConverter
from .woe_encoder import WOEEncoder
from .wrap_transformer import WrapTransformer

__all__ = [
    "Aggregator",
    "ColumnSelector",
    "ComplementLabelEncoder",
    "DateTransformer",
    "FrequencyEncoder",
    "FunctionTransformer",
    "Imputer",
    "MapTransformer",
    "MinorityTransformer",
    "OneHotEncoder",
    "OutlierClipper",
    "QuantileBinner",
    "CVTargetEncoder",
    "WOEEncoder",
    "HashingEncoder",
    "TargetEncoder",
    "RangeTransformer",
    "RowTransformer",
    "Scaler",
    "SetTransformer",
    "StringConcatenator",
    "StringSplitter",
    "TypeConverter",
    "WrapTransformer",
]
