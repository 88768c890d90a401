"""Serving/protocol layer (SURVEY §3.1-3.2, M4): result formats, the HTTP
data-query gateway, and the resend control-message lifecycle.

The engine (broker_spark.storage / operators) plans and executes queries;
this layer only frames and delivers results — the analog of the
reference's src/http/* and src/websocket/RequestHandler.ts."""
