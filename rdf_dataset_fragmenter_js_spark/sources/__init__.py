"""Quad sources: N-Quads/N-Triples files, composite concatenation, and the
synthetic Common-Crawl-style web-page table generator; Turtle files via
the driver-side parser (turtle.py), dispatched by read_rdf."""
