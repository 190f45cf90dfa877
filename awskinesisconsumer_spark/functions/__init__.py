"""Scalar/decode function library: EBML varint + typed-scalar decoders
and the element-schema registry (SURVEY §2 rows 3-5).
"""

from awskinesisconsumer_spark.functions.registry import (
    EBML_REGISTRY,
    EbmlType,
    registry_df,
)
from awskinesisconsumer_spark.functions.ebml_decode import (
    read_varint,
    decode_uint,
    decode_sint,
    decode_float,
    decode_date_ns,
    EBML_UNKNOWN_SIZE,
)

__all__ = [
    "EBML_REGISTRY", "EbmlType", "registry_df",
    "read_varint", "decode_uint", "decode_sint", "decode_float",
    "decode_date_ns", "EBML_UNKNOWN_SIZE",
]
