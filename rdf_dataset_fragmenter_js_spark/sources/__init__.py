"""Quad sources: N-Quads/N-Triples files, composite concatenation, and the
synthetic Common-Crawl-style web-page table generator."""
