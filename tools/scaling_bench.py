"""Scaling-efficiency evidence (BASELINE.json north_rule): run the IDENTICAL
KG-construction job at two parallelism levels (default local[8] vs
local[32]) on the same input and report throughput at both plus efficiency
= (tps_4N / tps_N) / 4.

Each level runs in a fresh child process (a JVM's master is fixed at
context creation). Child mode: `python tools/scaling_bench.py --child CPUS
N_PAGES` prints one JSON line.

Usage: python tools/scaling_bench.py [n_pages] [lo] [hi]
Writes BENCH.md at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_level(cpus: int, n_pages: int) -> dict:
    import time

    from bench import build_spark
    from rdf_dataset_fragmenter_js_spark.kg.pipeline import build_quads
    from rdf_dataset_fragmenter_js_spark.kg.webpages import synthetic_webpages

    import tempfile

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix=f"kg_scale_{cpus}_")
    synthetic_webpages(spark, n_pages, pods=max(n_pages // 100, 10)).write.mode(
        "overwrite"
    ).parquet(tmp)
    pages = spark.read.parquet(tmp)
    # warm-up: JVM/codegen (small prefix) so the measurement is steady-state
    build_quads(pages.limit(2000)).count()
    t0 = time.time()
    n_triples = build_quads(pages).count()
    sec = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "n_pages": n_pages, "triples": n_triples, "sec": round(sec, 2), "tps": round(n_triples / sec, 1)}


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--child":
        print(json.dumps(run_level(int(sys.argv[2]), int(sys.argv[3]))))
        return

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    results = []
    for cpus in (lo, hi):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus), str(n_pages)],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
        print(line)

    r_lo, r_hi = results
    factor = hi / lo
    eff = (r_hi["tps"] / r_lo["tps"]) / factor
    summary = {
        "n_pages": n_pages,
        "lo": r_lo,
        "hi": r_hi,
        "parallelism_factor": factor,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            f"""# BENCH — measured throughput & scaling evidence

Job: full KG-construction pipeline (synthetic web pages → byte-exact text
extraction → SVO triple extraction → canonicalization → quad graph), the
north-rule workload, identical input at both parallelism levels
({n_pages:,} pages, deterministic generator seeded by row index).

| parallelism | triples | wall sec | triples/sec |
|---|---|---|---|
| local[{lo}] | {r_lo['triples']:,} | {r_lo['sec']} | {r_lo['tps']:,} |
| local[{hi}] | {r_hi['triples']:,} | {r_hi['sec']} | {r_hi['tps']:,} |

**Scaling efficiency (N={lo} → {hi//lo if hi % lo == 0 else factor}N={hi}):
(tps@{hi} / tps@{lo}) / {factor:g} = {eff:.3f}** (target ≥ 0.8,
`BASELINE.json north_rule`; sandbox evidence per driver instruction — two
`local[k]` levels stand in for the N / 4N executor clusters).

Reproduce: `python tools/scaling_bench.py {n_pages} {lo} {hi}`.
Per-query timings: `python bench.py` (BENCH_r{{N}}.json).
"""
        )
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
