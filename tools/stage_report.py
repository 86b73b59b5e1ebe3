"""Per-stage execution report for any registered query.

Runs ``queries()[name](sf_dir)``, consumes the result, and prints the
Ray Data per-operator stats (wall time, rows, memory) so a stage that
dominates wall-clock is visible before anyone guesses at tuning.

Usage:
    python tools/stage_report.py <name> [sf_dir] [--cpus N]

Example:
    python tools/stage_report.py dedup_minhash_lsh /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus, include_dashboard=False
        )
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if args.name not in qs:
        sys.exit(
            f"unknown query {args.name!r}; choices: {', '.join(sorted(qs))}"
        )
    t0 = time.perf_counter()
    res = qs[args.name](args.sf_dir)
    is_ds = hasattr(res, "stats")
    if is_ds:
        # materialize() (fine at report scale) keeps per-operator stats
        # attached; a bare count() takes a metadata shortcut and reports
        # nothing.
        res = res.materialize()
        n = res.count()
    else:
        n = res.num_rows if hasattr(res, "num_rows") else len(res)
    wall = time.perf_counter() - t0
    print(f"== {args.name}: {n} rows in {wall:.2f}s ({args.cpus} cpus) ==")
    if is_ds:
        print(res.stats())
    else:
        print(
            "(driver-side materialized result — per-stage stats were "
            "consumed inside the query; re-run with RAY_DATA_VERBOSE "
            "stats for intermediate datasets)"
        )
    ray.shutdown()


if __name__ == "__main__":
    main()
