"""Schemas: the transcripts input table and the three sink tables.

Input shape is authoritative from BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp)``.

Sink shapes mirror the reference's three signal exporters
(FIXTURES.md §5; reference signal models at
pkg/receiver/smartagentreceiver/converter/{metrics,event,traces}.go):

* ``sink_metrics``  — signalfx-style datapoints
* ``sink_events``   — splunk-hec-style events (source/sourcetype per
  cmd/otelcol/config/collector/splunk_logs_config_linux.yaml:56-61)
* ``sink_traces``   — sapm-style spans
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Columns added by the parse stage (sparkcollector.parse).  All nullable:
# a turn with no embedded log fragment parses to NULLs and MUST NOT be
# dropped (stanza parsers leave non-matching records intact).
PARSED_FIELDS = [
    ("severity", T.StringType()),
    ("tool_name", T.StringType()),
    ("tool_status", T.StringType()),
    ("dur_ms", T.LongType()),
    ("span_id", T.StringType()),
    ("parent_span_id", T.StringType()),
    ("span_op", T.StringType()),
    ("log_ts", T.TimestampType()),
]

PARSED_STRUCT = T.StructType(
    [T.StructField(n, t, True) for n, t in PARSED_FIELDS]
)

SINK_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

SINK_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("severity", T.StringType(), True),
        T.StructField("body", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("sourcetype", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
    ]
)

SINK_TRACES_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType(), False),
        T.StructField("span_id", T.StringType(), False),
        T.StructField("parent_span_id", T.StringType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("dur_ms", T.LongType(), True),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
    ]
)

SINKS = ("metrics", "events", "traces")
