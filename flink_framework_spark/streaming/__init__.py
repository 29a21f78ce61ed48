"""Structured Streaming twins of the batch operators.

The reference is a stream processor: its jobs are Flink DataStream
programs over Kafka-transported subjects (SURVEY.md §1.1). Spark's
equivalent execution mode is Structured Streaming's micro-batch loop
(SURVEY.md §3.2 Entry 3). The engine keeps ONE logical definition per
operator (``operators.streaming_ops``) and runs it over either
``spark.read`` or ``spark.readStream`` — batch≡stream equivalence is
property-tested in the suite.
"""

from flink_framework_spark.streaming.twins import (  # noqa: F401
    read_events_stream,
    run_to_memory,
)
