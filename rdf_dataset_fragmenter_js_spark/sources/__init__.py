"""Quad sources: N-Quads/N-Triples files (vectorized line parser),
composite concatenation, and the synthetic Common-Crawl-style web-page
table generator; Turtle, RDF/XML, and JSON-LD via per-file parsers
(turtle.py, rdfxml.py, jsonld.py — one file on the driver, globs and
directories distributed over executors by driverfile.py), all dispatched
by extension through read_rdf."""
