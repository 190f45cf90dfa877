"""awskinesisconsumer_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of SergiyStoyan/AwsKinesisConsumer.

The reference (/root/reference, ~1,050 LoC Python 2.7) is a streaming
Kinesis-Video consumer: EBML tokenizer → fragment segmentation → tag
pivot → as-of join → decode/explode → throttle → bounded retention →
multi-sink. This package re-expresses every one of those operators
Spark-first (DataFrame/SQL + Structured Streaming), plus the
LLM-data-pipeline extension operators (dedup, similarity search,
multimodal columns, text analysis) mandated by the north star.

Layout:
  session.py    — SparkSession builder tuned for scale (AQE, Arrow)
  io.py         — test-table loaders for /root/testdata/sf*
  operators/    — batch operators (as-of join, segmentation, pivot, …)
  functions/    — scalar/decode function library (EBML varint, scalars)
  sources/      — EBML tokenizer source, stream replay source
  streaming/    — Structured Streaming pipeline (the reference's DAG)
  plans/        — composed end-to-end plans (flagship query)
"""

__version__ = "0.1.0"
