"""Scalar function library: hashes, IRI resolution, JS-regex compatibility."""
