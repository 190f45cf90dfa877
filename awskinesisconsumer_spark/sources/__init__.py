"""Sources: the EBML tokenizer scan stage and stream-replay helpers."""

from awskinesisconsumer_spark.sources.ebml import (
    parse_ebml_chunks,
    tokenize_bytes,
    encode_element,
    ELEMENT_SCHEMA,
)

__all__ = [
    "parse_ebml_chunks", "tokenize_bytes", "encode_element", "ELEMENT_SCHEMA",
]
