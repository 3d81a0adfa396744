"""Sinks: document-IRI → path mapping and partitioned writes."""
