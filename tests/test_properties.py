"""Property-style tests: adversarial round-trips and dual-path parity.

The engine keeps driver-side fast paths semantically identical to the
distributed plans; these tests attack exactly those equivalences plus the
serializer/parser pair with generated inputs (hypothesis for the pure
kernels; one seeded nasty-corpus Spark round-trip for the Column paths —
one job per test, not per example)."""

from __future__ import annotations

import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rdf_dataset_fragmenter_js_spark.quads import quad, quads_df

NASTY = [
    "",
    " ",
    'quote " inside',
    "back\\slash",
    "new\nline",
    "tab\there",
    "\r carriage",
    'both "quoted" and \\escaped\\',
    "unicode café — naïve ☃",
    'trailing backslash \\',
    '"',
    "\\",
    "\\n literal-backslash-n",
    "ends with newline\n",
]


def _seeded_corpus(n: int = 200) -> list[str]:
    rng = random.Random(42)
    alphabet = string.ascii_letters + string.digits + ' .,"\\\n\t-_#@é☃'
    out = list(NASTY)
    for _ in range(n):
        out.append("".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))))
    return out


def test_nquads_roundtrip_nasty_literals(spark):
    from rdf_dataset_fragmenter_js_spark.sources.nquads import (
        parse_nquads_lines,
        serialize_nquads,
    )

    rows = [
        quad("http://ex.org/s", "http://ex.org/p", text, o_type="Literal", seq=i)
        for i, text in enumerate(_seeded_corpus())
    ]
    quads = quads_df(spark, rows)
    lines = serialize_nquads(quads).select("line")
    back = parse_nquads_lines(lines, "line")
    want = sorted((r[0], r[1], r[2], r[3], r[4]) for r in quads.collect())
    got = sorted((r[0], r[1], r[2], r[3], r[4]) for r in back.collect())
    assert got == want


def test_normalize_surface_column_vs_driver_python(spark):
    """The driver fast path (_normalize_surface_py) must match the Column
    expression (normalize_surface_col) byte-for-byte — the hot pipeline
    relies on their equivalence."""
    from rdf_dataset_fragmenter_js_spark.kg.canonicalize import (
        _normalize_surface_py,
        normalize_surface_col,
    )

    corpus = _seeded_corpus() + ["A. Johnson", "Alice R. Johnson", "x.y.", "a."]
    df = spark.createDataFrame([(s,) for s in corpus], "surface string")
    got = [
        r.norm
        for r in df.select(normalize_surface_col(F.col("surface")).alias("norm"))
        .collect()
    ]
    want = [_normalize_surface_py(s) for s in corpus]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    base=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 8)), max_size=20
    ),
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), max_size=20
    ),
)
def test_bnode_closure_matches_bruteforce(base, edges):
    """_closure_driver == brute-force reachability: bnode b gets owner o iff
    some seed (b0, o) exists with b reachable from b0 along edges."""
    from rdf_dataset_fragmenter_js_spark.strategies.bnode import _closure_driver

    b_rows = [(f"b{b}", f"o{o}") for b, o in base]
    e_rows = [(f"b{s}", f"b{d}") for s, d in edges]
    got = set(_closure_driver(b_rows, e_rows))

    # brute force: reachability from each seeded bnode
    adj: dict[str, set] = {}
    for s, d in e_rows:
        adj.setdefault(s, set()).add(d)
    want = set()
    for b0, o in b_rows:
        seen = {b0}
        stack = [b0]
        while stack:
            cur = stack.pop()
            want.add((cur, o))
            for nxt in adj.get(cur, ()):
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda t: t[0] != t[1]),
        max_size=25,
    )
)
def test_canonical_clusters_match_connectivity(pairs):
    """_canonical_mapping_driver_dict with threshold 0 (every blocked pair
    verifies) assigns two forms the same canonical id iff they are connected
    through the blocking graph — and the id is a cluster member."""
    from rdf_dataset_fragmenter_js_spark.kg.canonicalize import (
        _canonical_mapping_driver_dict,
    )

    # forms share a block iff they share first/last token; build forms so
    # that pair (a, b) connects via a shared token "tA_B"
    forms = sorted({f"f{a} l{min(a,b)}x{max(a,b)}" for a, b in pairs} | {f"f{a}" for a, _ in pairs})
    out = _canonical_mapping_driver_dict(forms, containment_threshold=0.0)
    assert set(out) == set(forms)
    # representative is a member of the input set (slugged)
    slugged = {f.replace(" ", "_") for f in forms}
    assert set(out.values()) <= slugged
    # idempotence of representatives: rep of rep == rep
    rep_of = {f.replace(" ", "_"): c for f, c in out.items()}
    for c in set(out.values()):
        assert rep_of.get(c, c) == c


def test_imurmurhash_canonical_vectors():
    """Pin the hash to published MurmurHash3 x86-32 seed-0 test vectors —
    for ASCII input, npm imurmurhash (the reference's hash) equals standard
    MurmurHash3 over the ASCII bytes."""
    from rdf_dataset_fragmenter_js_spark.functions.hashing import imurmurhash

    assert imurmurhash("") == 0x0
    assert imurmurhash("test") == 0xBA6BD213
    assert imurmurhash("hello") == 0x248BFA47
    assert imurmurhash("Hello, world!") == 0xC0363E43
    assert imurmurhash("The quick brown fox jumps over the lazy dog") == 0x2E4FF723
