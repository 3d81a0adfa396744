"""Event-stream operators: batch sessionization (window functions), the
Structured-Streaming variants for unbounded ingest, and incremental
pipeline execution over append-only quad directories (fragment.py)."""
