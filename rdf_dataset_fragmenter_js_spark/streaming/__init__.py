"""Event-stream operators: batch sessionization (window functions) and the
Structured-Streaming variants for unbounded ingest."""
