"""Measure the BOX's own 8-vs-32-process scaling ceiling for the bare
kernel (no Ray): multiprocessing over the cached bench corpus files.
The Ray-level scaling efficiency can never exceed this number; run it in
the same machine state as bench.py --scaling to interpret a draw.

Usage: python tools/calibrate_mp.py [corpus_glob]
"""

from __future__ import annotations

import glob
import multiprocessing as mp
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _work(path: str) -> int:
    import sys

    import pyarrow.parquet as pq

    if _REPO not in sys.path:  # pool workers may not inherit cwd
        sys.path.insert(0, _REPO)
    from go_boilerpipe_ray.kernel.spans import extract_from_spans

    t = pq.read_table(path, columns=["spans"])
    n = 0
    for spans in t.column("spans").to_pylist():
        extract_from_spans(spans)
        n += 1
    return n


def run(files: list[str], procs: int) -> float:
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        total = sum(pool.map(_work, files, chunksize=1))
    dt = time.perf_counter() - t0
    return total / dt


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--json"]
    as_json = "--json" in sys.argv[1:]
    pat = argv[0] if argv else "/tmp/gbr_cache/bench_corpus_*/*.parquet"
    files = sorted(glob.glob(pat))
    if not files:
        raise SystemExit(f"no corpus files match {pat} — run bench.py once first")
    # A pool can only be as parallel as its task list: with < 2 tasks per
    # worker at the widest level the "ceiling" would measure file-count
    # granularity, not the machine.  Replicate the file list (identical
    # total work at BOTH levels, so the ratio stays comparable).
    reps = max(1, -(-64 // len(files)))  # ceil(64 / n)
    files = files * reps
    # Interleave lo/hi draws so both levels see the same machine states.
    readings = {8: [], 32: []}
    for _ in range(2):
        for procs in (8, 32):
            readings[procs].append(run(files, procs))
    lo, hi = max(readings[8]), max(readings[32])
    if as_json:
        import json

        print(
            json.dumps(
                {
                    "lo": round(lo, 1),
                    "hi": round(hi, 1),
                    "efficiency": round(hi / (4 * lo), 3),
                }
            )
        )
        return
    print(
        f"raw-mp ceiling: {lo:.1f} docs/s @8 procs, {hi:.1f} @32, "
        f"efficiency {hi / (4 * lo):.3f} "
        f"(draws lo={[f'{x:.0f}' for x in readings[8]]}, "
        f"hi={[f'{x:.0f}' for x in readings[32]]})"
    )


if __name__ == "__main__":
    main()
