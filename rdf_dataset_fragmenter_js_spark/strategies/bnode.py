"""Blank-node ownership propagation — the shared primitive behind the
subject/object strategies and dataset-summary attribution.

Reference semantics (``lib/strategy/FragmentationBlankNodeBuffer.ts``):

* a quad whose *key* term (subject for the subject strategy, object for the
  object strategy) is a blank node is buffered;
* a blank node appearing as the *value* term of a quad with a **named** key
  is "owned" by that key (``materializeValueForNamedKey``, :53-64);
* at flush, each buffered quad is emitted into the document of **every**
  owner of its key bnode (multi-owner duplication, :77-84), and ownership
  chases bnode→bnode chains to a fixpoint (:83 re-registers the value term
  under the owner — i.e. owners propagate along key→value edges **from owned
  bnodes only**);
* bnodes that never acquire a named owner are dropped with a warning
  (:111-120).

Spark design: ownership is a small transitive closure computed with an
iterative join loop (frontier semi-join style, ``localCheckpoint`` per
iteration to cut lineage). Chains in real RDF data are short (lists,
reification), so the loop converges in a handful of iterations; each
iteration is a broadcast-friendly join because the link table is tiny
relative to the quad table. At 100 TB the quad scan happens once — only the
(bnode, owner) link table iterates.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.quads import BLANK_NODE, NAMED_NODE

logger = logging.getLogger(__name__)

#: Safety bound; real chains are list-shaped and short.
MAX_ITERATIONS = 50


def _is(df_col: Column, term_type: str) -> Column:
    return df_col == term_type


def _closure_driver(
    b_rows, e_rows, max_iterations: int = MAX_ITERATIONS
) -> list[tuple[str, str]]:
    """Driver-side ownership closure (owners propagate along src→dst edges)
    — identical semantics to the distributed loop, including the same
    propagation-depth cap (one edge-hop per 'iteration') and warning, so a
    >max_iterations-deep chain behaves identically on both paths."""
    from collections import defaultdict, deque

    own: dict[str, set] = defaultdict(set)
    for b, o in b_rows:
        own[b].add(o)
    adj: dict[str, list] = defaultdict(list)
    for s, d in e_rows:
        adj[s].append(d)
    queue = deque((b, 0) for b in list(own.keys()))
    capped = False
    while queue:
        b, depth = queue.popleft()
        if depth >= max_iterations:
            capped = True
            continue
        for d in adj.get(b, ()):
            new = own[b] - own[d]
            if new:
                own[d] |= new
                queue.append((d, depth + 1))
    if capped:
        logger.warning("bnode ownership did not converge in %d iterations", max_iterations)
    return [(b, o) for b, owners in own.items() for o in owners]


def bnode_owners(
    quads: DataFrame,
    key: str,
    key_type: str,
    value: str,
    value_type: str,
    max_iterations: int = MAX_ITERATIONS,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Compute the distinct (bnode, owner) ownership table.

    ``key``/``value`` are quad column names (e.g. ``"s"``/``"o"`` for the
    subject strategy). Returns DataFrame[bnode: string, owner: string].

    Two physical strategies (same split as ``near_dup_clusters`` /
    ``canonical_mapping``): link tables ≤ ``driver_threshold`` rows are
    collected and closed on the driver in plain Python — the distributed
    loop costs ~3 jobs of fixed scheduling per iteration, which dwarfs the
    BFS on small link sets. Above the threshold, the iterative
    frontier-join loop runs (the 100 TB path: only the link table iterates,
    never the quads). Measured crossover (BENCH.md "Distributed-path
    timings"): on pre-materialized link tables the distributed loop edges
    out the driver BFS at ~300k links, but inside the full routing query
    the two paths tie at that size (A/B, warm: 16.4 s vs 16.5 s) — the
    1M default keeps the simpler path where it is not measurably worse."""
    # Both link tables come out of ONE pass over the quads (they share the
    # bnode-valued filter and differ only in the key's term type), so the
    # quad-generation plan materializes exactly once into one checkpoint;
    # base/edges are projections over the materialized rows, the threshold
    # probe and driver transfer read them directly, and the distributed
    # loop re-joins `edges` every iteration without re-deriving the quads.
    links = (
        quads.filter(_is(F.col(value_type), BLANK_NODE))
        .select(
            F.col(key_type).alias("__kt"),
            F.col(key).alias("__k"),
            F.col(value).alias("__v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Base: named key → bnode value  (FragmentationBlankNodeBuffer.ts:53-64)
    base = links.filter(_is(F.col("__kt"), NAMED_NODE)).select(
        F.col("__v").alias("bnode"), F.col("__k").alias("owner")
    )
    # Edges among buffered quads: bnode key → bnode value (chain links, :83)
    edges = links.filter(_is(F.col("__kt"), BLANK_NODE)).select(
        F.col("__k").alias("src"), F.col("__v").alias("dst")
    )

    if driver_threshold:
        # Cheap count probes first — an over-threshold table costs one
        # count job against the checkpoint, never a multi-hundred-MB driver
        # transfer. Under threshold: Arrow-batched toPandas both ways (and
        # a pandas-backed createDataFrame back) — columnar batches, not
        # py4j Row objects.
        if base.limit(driver_threshold + 1).count() <= driver_threshold:
            if edges.limit(driver_threshold + 1).count() <= driver_threshold:
                import pandas as pd

                b_pdf = base.toPandas()
                e_pdf = edges.toPandas()
                pairs = _closure_driver(
                    list(zip(b_pdf["bnode"], b_pdf["owner"])),
                    list(zip(e_pdf["src"], e_pdf["dst"])),
                    max_iterations=max_iterations,
                )
                spark = quads.sparkSession
                if not pairs:
                    return spark.createDataFrame([], "bnode string, owner string")
                out = pd.DataFrame(pairs, columns=["bnode", "owner"])
                return spark.createDataFrame(out)

    owners = base
    frontier = owners
    for _ in range(max_iterations):
        grown = (
            frontier.join(edges, frontier["bnode"] == edges["src"])
            .select(F.col("dst").alias("bnode"), F.col("owner"))
            .distinct()
            .join(owners, on=["bnode", "owner"], how="left_anti")
            .localCheckpoint(eager=True)
        )
        if grown.isEmpty():
            break
        owners = owners.unionByName(grown).localCheckpoint(eager=True)
        frontier = grown
    else:
        logger.warning("bnode ownership did not converge in %d iterations", max_iterations)
    return owners


def route_bnode_quads(
    quads: DataFrame,
    key: str,
    key_type: str,
    value: str,
    value_type: str,
) -> DataFrame:
    """Route buffered (bnode-key) quads into every owner's document.

    Unowned bnode quads are dropped (the reference only warns,
    FragmentationBlankNodeBuffer.ts:111-120). Output: ``doc`` + quad columns,
    duplicated per distinct owner (multi-owner semantics, jest fixture
    ``FragmentationStrategySubject-test.ts:160-167``).
    """
    bnode_quads = quads.filter(_is(F.col(key_type), BLANK_NODE))
    # Short-circuit: most real pipelines have no bnode-keyed quads at all —
    # one limit-1 probe (filter pushed to the scan) avoids the whole
    # iterative-closure machinery and its checkpoint jobs.
    if bnode_quads.limit(1).isEmpty():
        return quads.limit(0).select(F.lit("").alias("doc"), *quads.columns)
    owners = bnode_owners(quads, key, key_type, value, value_type)
    # No broadcast hint: the (bnode, owner) table is usually small but can be
    # proportional to the data at web scale — let AQE pick broadcast vs
    # shuffle-hash at runtime (it sees the actual size post-closure).
    routed = bnode_quads.join(
        owners.withColumnRenamed("bnode", "__bk"),
        bnode_quads[key] == F.col("__bk"),
        "inner",
    ).select(F.col("owner").alias("doc"), *[bnode_quads[c] for c in quads.columns])
    return routed
