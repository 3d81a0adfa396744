"""Synthesize a larger scale-factor testdata dir from an existing one by
replicating every table ``factor``× with **consistent key shifting**, so the
oracle gate (tools/check_oracle.py) can run at scales the driver does not
ship (TESTDATA.md caps at sf0.1). Both engines read the produced parquet,
so the correctness comparison stays valid at any factor; the point of the
run is the TIMING evidence — per-entry growth vs sf0.1 must stay ~linear
(VERDICT r4 task #5: "no entry superlinear").

Replication rules (TPC-H semantics):

* fact/bridge tables shift each key column by ``copy * (max(domain)+1)``,
  with one shared offset per key DOMAIN (``o_custkey`` and ``c_custkey``
  shift together), so joins stay within-copy and IRIs minted from keys
  (plans/testdata.py) never collide across copies;
* ``region``/``nation`` are fixed-size dimensions at every TPC-H sf —
  copied once, unshifted, like the real generator would;
* ``documents.text`` gets a per-copy suffix (and ``n_chars`` keeps
  counting honestly) so exact/near-duplicate clusters stay within-copy —
  otherwise every document would gain ``factor-1`` cross-copy clones and
  pair-producing dedup operators would grow quadratically BY SEMANTICS,
  which would contaminate the superlinearity check;
* ``embeddings.embedding`` vectors get a per-copy DIMENSION PERMUTATION
  (seeded, copy 0 untouched): within one copy every pairwise dot product
  and norm is preserved exactly (same near-dup clusters, same top-k
  structure), while cross-copy cosines drop to ~N(0, 1/d) noise — the
  same within-copy-clusters property the text suffix gives documents,
  for the same reason;
* each copy is written as its own parquet row group, so the scan is
  splittable without the register_views repartition crutch.

Usage: python tools/make_bigsf.py [factor] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/sf1
"""

from __future__ import annotations

import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

#: table -> {key column -> key domain}
SHIFTS = {
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supp"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "events": {"event_id": "ev", "user_id": "user"},
}

#: key domain -> (owning table, primary key column) for the offset base
DOMAIN_OWNER = {
    "cust": ("customer", "c_custkey"),
    "ord": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
    "ev": ("events", "event_id"),
    "user": ("events", "user_id"),
}

FIXED_DIMS = ("region", "nation")


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)

    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in
              list(SHIFTS) + list(FIXED_DIMS)}

    import pyarrow.compute as pc

    base = {
        dom: pc.max(tables[tab].column(col)).as_py() + 1
        for dom, (tab, col) in DOMAIN_OWNER.items()
    }

    for t in FIXED_DIMS:
        pq.write_table(tables[t], f"{out}/{t}.parquet")

    for t, shifts in SHIFTS.items():
        tab = tables[t]
        t0 = time.time()
        with pq.ParquetWriter(f"{out}/{t}.parquet", tab.schema) as w:
            for i in range(factor):
                cols = []
                for name in tab.schema.names:
                    col = tab.column(name)
                    if name in shifts and i:
                        off = i * base[shifts[name]]
                        col = pc.cast(
                            pc.add(col, pa.scalar(off, type=pa.int64())),
                            tab.schema.field(name).type,
                        )
                    elif t == "documents" and name == "text" and i:
                        col = pc.binary_join_element_wise(
                            pc.cast(col, pa.string()), f" c{i}", ""
                        )
                    elif t == "documents" and name == "n_chars" and i:
                        col = pc.add(col, len(f" c{i}"))
                    elif t == "embeddings" and name == "embedding" and i:
                        import numpy as np

                        arrs = col.combine_chunks()
                        if isinstance(arrs, pa.ChunkedArray):
                            arrs = arrs.chunk(0)
                        flat = arrs.flatten().to_numpy(zero_copy_only=False)
                        d = len(arrs[0])
                        perm = np.random.default_rng(9_000_000 + i).permutation(d)
                        mat = flat.reshape(-1, d)[:, perm]
                        col = pa.FixedSizeListArray.from_arrays(
                            pa.array(mat.reshape(-1), type=pa.float32()), d
                        ).cast(tab.schema.field(name).type)
                    cols.append(col)
                w.write_table(
                    pa.table(dict(zip(tab.schema.names, cols)), schema=tab.schema)
                )
        print(f"{t}: {tab.num_rows} -> {tab.num_rows * factor} rows "
              f"({time.time() - t0:.1f}s)")
    print(f"wrote factor={factor} of {src} to {out}")


if __name__ == "__main__":
    main()
