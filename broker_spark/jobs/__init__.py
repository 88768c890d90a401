"""Maintenance job entrypoints (the reference's *Cmd scripts as
spark-submit-able mains): retention sweep and compaction."""
