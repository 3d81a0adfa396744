"""Fragmentation strategies — assign each quad a fragment document IRI.

Reference: ``lib/strategy/*`` — each strategy consumes the quad stream and
pushes ``(documentIri, quad)`` pairs into the sink. Here each strategy is a
pure function ``DataFrame[quads] -> DataFrame[doc + quads]``; Catalyst fuses
the routing expressions with up/downstream stages.
"""

from rdf_dataset_fragmenter_js_spark.strategies.routing import (
    route_composite,
    route_constant,
    route_exception,
    route_object,
    route_resource_object,
    route_subject,
)

__all__ = [
    "route_composite",
    "route_constant",
    "route_exception",
    "route_object",
    "route_resource_object",
    "route_subject",
]
