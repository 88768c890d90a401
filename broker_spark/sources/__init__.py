"""Stream sources adapting external feeds onto the StreamMessage envelope.

A production deployment reads `spark.readStream.format("kafka")` with one
topic per ingest adapter (SURVEY §2.1 S1-S3); this package provides the
envelope mapping plus a self-contained synthetic source for tests/demos."""
