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


def _work(task: tuple[str, int, int]) -> int:
    """Extract every n_shards-th row of one file starting at `shard` —
    sharding WITHIN files keeps total work constant while giving the
    pool enough tasks to actually reach its width."""
    import sys

    import pyarrow.parquet as pq

    if _REPO not in sys.path:  # pool workers may not inherit cwd
        sys.path.insert(0, _REPO)
    from go_boilerpipe_ray.kernel.spans import extract_from_spans

    path, shard, n_shards = task
    t = pq.read_table(path, columns=["spans"])
    col = t.column("spans")
    n = 0
    for i in range(shard, t.num_rows, n_shards):
        extract_from_spans(col[i].as_py())
        n += 1
    return n


def run(tasks: list[tuple[str, int, int]], procs: int) -> float:
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        total = sum(pool.map(_work, tasks, chunksize=1))
    dt = time.perf_counter() - t0
    return total / dt


def main() -> None:
    args = sys.argv[1:]
    as_json = "--json" in args
    rounds = 1 if "--rounds=1" in args else 2
    argv = [a for a in args if not a.startswith("--")]
    pat = argv[0] if argv else "/tmp/gbr_cache/bench_corpus_*/*.parquet"
    files = sorted(glob.glob(pat))
    if not files:
        raise SystemExit(f"no corpus files match {pat} — run bench.py once first")
    # A pool can only be as parallel as its task list: with < 2 tasks per
    # worker at the widest level the "ceiling" would measure file-count
    # granularity, not the machine.  Shard WITHIN files (row stride) so
    # the task list reaches >= 64 while total work stays one corpus pass.
    n_shards = max(1, -(-64 // len(files)))  # ceil(64 / n)
    tasks = [(f, s, n_shards) for f in files for s in range(n_shards)]
    # Interleave lo/hi draws so both levels see the same machine states.
    readings = {8: [], 32: []}
    for _ in range(rounds):
        for procs in (8, 32):
            readings[procs].append(run(tasks, procs))
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
