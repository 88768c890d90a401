"""Adapters mapping the driver's `events` fixture onto the StreamMessage
envelope so the real resend/metadata operators run unmodified on it.

Mapping (mirrored literally in the DuckDB oracle SQL):
    stream_id    = event_type
    partition    = int(user_id % 8)
    ts           = ts
    sequence_no  = int(event_id)          (unique -> deterministic ordering)
    publisher_id = 'u' || user_id
    msg_chain_id = '1'
    content      = props
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: SQL fragment equivalent of events_as_stream, used by the oracle strings.
EVENTS_AS_STREAM_SQL = (
    "SELECT event_type AS stream_id, "
    "CAST(user_id % 8 AS INT) AS partition, "
    "ts, "
    "CAST(event_id AS INT) AS sequence_no, "
    "concat('u', CAST(user_id AS VARCHAR)) AS publisher_id, "
    "'1' AS msg_chain_id, "
    "props AS content "
    "FROM events"
)


def events_as_stream(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("event_type").alias("stream_id"),
        (F.col("user_id") % 8).cast("int").alias("partition"),
        F.col("ts"),
        F.col("event_id").cast("int").alias("sequence_no"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("publisher_id"),
        F.lit("1").alias("msg_chain_id"),
        F.col("props").alias("content"),
    )


#: Deterministic media-table derivation from `documents` (the container has
#: no real media fixtures): kind cycles by doc_id, payload is the utf-8
#: text, durations/dimensions are doc_id-derived — mirrored in SQL below.
MEDIA_SQL = (
    "SELECT doc_id AS media_id, "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END AS kind, "
    "encode(text) AS payload, "
    "CAST(CASE WHEN doc_id % 3 = 0 THEN length(text) % 640 + 1 END AS INT) AS width, "
    "CAST(CASE WHEN doc_id % 3 <> 0 THEN (doc_id % 10 + 1) * 2500 END AS BIGINT)"
    " AS duration_ms "
    "FROM documents"
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.length("text") % 640 + 1)
        .cast("int")
        .alias("width"),
        F.when(F.col("doc_id") % 3 != 0, (F.col("doc_id") % 10 + 1) * 2500)
        .cast("long")
        .alias("duration_ms"),
    )
