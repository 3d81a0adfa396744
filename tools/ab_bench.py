"""Interleaved A/B bench across git HEADs — THE protocol for perf claims.

Round-level BENCH_r{N}.json files are measured in different host windows
and swing 2-4x for identical code (documented in BENCH.md), so a
cross-round delta is meaningless on its own.  This tool settles any
regression question the way round 3 settled the remap one:

  1. one git worktree per HEAD (so both builds coexist),
  2. the SAME host window — trials are INTERLEAVED A,B,A,B,... so a
     contention spike hits both sides equally in expectation,
  3. best-of-N per query per side (noise here is additive; min is the
     closest estimator of capacity).

Usage:
    python tools/ab_bench.py r3=<sha> r4=HEAD [--rounds 3] [--out FILE]

Each side runs the full ``bench.py`` of ITS OWN worktree (cwd and
PYTHONPATH point inside the worktree — executors must import that tree's
package, not the repo's; a wrong path yields silently-empty results).
Prints a per-query comparison table and one JSON line with all trials.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(*cmd: str, cwd: str = REPO) -> str:
    return subprocess.run(
        cmd, cwd=cwd, check=True, capture_output=True, text=True
    ).stdout.strip()


def make_worktree(name: str, ref: str) -> str:
    """(Re)create a detached worktree for ``ref`` at /tmp/ab_<name>."""
    path = f"/tmp/ab_{name}"
    if os.path.exists(path):
        subprocess.run(
            ["git", "worktree", "remove", "--force", path],
            cwd=REPO,
            capture_output=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    sh("git", "worktree", "add", "--force", "--detach", path, ref)
    return path


def run_bench(worktree: str) -> dict:
    """One full bench.py trial inside ``worktree``; returns its JSON line."""
    env = dict(os.environ)
    env["PYTHONPATH"] = worktree
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=worktree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py in {worktree} exited {proc.returncode}; stderr tail:\n"
            + proc.stderr[-2000:]
        )
    # Spark progress bars glue \r frames onto stdout; the result is the
    # last line that parses as a JSON object.
    for line in reversed(proc.stdout.replace("\r", "\n").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise RuntimeError(
        f"bench.py in {worktree} produced no JSON line; stderr tail:\n"
        + proc.stderr[-2000:]
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sides", nargs="+", help="NAME=GITREF pairs, e.g. r3=abc123 r4=HEAD")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default=None, help="also write the JSON line here")
    args = ap.parse_args()

    sides: list[tuple[str, str, str]] = []
    for spec in args.sides:
        name, _, ref = spec.partition("=")
        if not ref:
            ap.error(f"side {spec!r} must be NAME=GITREF")
        sha = sh("git", "rev-parse", "--short", ref)
        sides.append((name, sha, make_worktree(name, ref)))
        print(f"side {name}: {sha} -> /tmp/ab_{name}", file=sys.stderr)

    trials: dict[str, list[dict]] = {name: [] for name, _, _ in sides}
    for rnd in range(args.rounds):
        for name, _, wt in sides:  # interleaved: A,B,A,B,...
            t0 = time.time()
            res = run_bench(wt)
            trials[name].append(res)
            print(
                f"round {rnd + 1}/{args.rounds} {name}: total "
                f"{res['total_sec']}s, {res['value']} tps "
                f"({time.time() - t0:.0f}s wall)",
                file=sys.stderr,
            )

    # best-of-N per query per side
    best: dict[str, dict[str, float]] = {}
    for name, _, _ in sides:
        per_q: dict[str, float] = {}
        for t in trials[name]:
            for q, s in t["queries"].items():
                per_q[q] = min(per_q.get(q, s), s)
        per_q["__tps"] = max(t["value"] for t in trials[name])
        best[name] = per_q

    base = sides[0][0]
    queries = [q for q in best[base] if q != "__tps"]
    header = ["query"] + [n for n, _, _ in sides] + ["delta"]
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    for q in queries:
        vals = [best[n].get(q) for n, _, _ in sides]
        delta = (
            f"{vals[-1] - vals[0]:+.2f}s"
            if vals[0] is not None and vals[-1] is not None
            else "n/a"
        )
        cells = [f"{v:.2f}" if v is not None else "-" for v in vals]
        print(f"| {q} | " + " | ".join(cells) + f" | {delta} |")
    tps = [best[n]["__tps"] for n, _, _ in sides]
    print(
        f"| kg_triples_per_sec (best) | "
        + " | ".join(f"{v:,.0f}" for v in tps)
        + f" | {tps[-1] / tps[0]:.2f}x |"
    )

    out = {
        "protocol": "interleaved-worktree-best-of-N",
        "rounds": args.rounds,
        "sides": {n: sha for n, sha, _ in sides},
        "best": best,
        "trials": {n: [t["queries"] | {"__tps": t["value"]} for t in ts] for n, ts in trials.items()},
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
