"""Shared helpers for the functions package."""

from __future__ import annotations


def default_pool() -> int:
    """Fixed actor-pool size at 75% of cluster CPUs (see
    pipelines.article._default_concurrency for the rationale)."""
    from ..pipelines.article import _default_concurrency

    return _default_concurrency()


def _strip_schema_metadata(batch):
    return batch.replace_schema_metadata(None)


_EMPTY_SCHEMA_FILTER_INSTALLED = False


def install_empty_block_schema_filter() -> None:
    """Drop Ray's "RefBundle with a different schema ... new schema: ."
    warning for SCHEMALESS EMPTY bundles only.  A map_groups task whose
    sorted input partition is empty yields zero batches (the group-UDF
    wrapper iterates group boundaries and never calls the kernel —
    ray/data/grouped_data.py:_apply_udf_to_groups), so Ray emits an
    empty RefBundle with no schema and the executor warns on the
    mismatch.  Downstream operators skip empty bundles, so the message
    is benign noise at small sf (empty hash partitions); a REAL schema
    divergence between two non-empty bundles prints a non-empty new
    schema and still warns.  Known trade-offs, accepted: (a) a
    hypothetical non-empty ZERO-COLUMN bundle renders the same empty
    schema string and would be silenced too (no operator here emits
    one); (b) the match is pinned to Ray 2.49's message wording — if a
    Ray upgrade rewords it, the filter becomes a no-op and the benign
    noise returns (fail-open, never hides new warnings).  Idempotent;
    called by bench.py and tools/selfcheck.py."""
    global _EMPTY_SCHEMA_FILTER_INSTALLED
    if _EMPTY_SCHEMA_FILTER_INSTALLED:
        return
    import logging

    class _EmptyNewSchemaFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "RefBundle with a different schema" in msg
                and "new schema: . This may" in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyNewSchemaFilter())
    _EMPTY_SCHEMA_FILTER_INSTALLED = True


def read_parquet_clean(path: str, **kwargs):
    """``ray.data.read_parquet`` that drops writer schema metadata.

    Parquet written by pandas embeds a ``b'pandas'`` metadata blob;
    pyarrow schemas carrying it are UNHASHABLE, which defeats Ray's
    block-schema dedup (``unify_schemas`` logs "Failed to hash the
    schemas ... unhashable type: 'dict'" and keeps every schema copy).
    Stripping is zero-copy and fuses into the read stage."""
    import ray.data

    return ray.data.read_parquet(path, **kwargs).map_batches(
        _strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )


def cut_lineage(ds):
    """Rebuild a materialized dataset from its block refs, dropping the
    logical-plan history.

    An iterative pipeline that references its round-N output more than
    once in round N+1 doubles its logical-plan tree every round —
    ``materialize()`` pins the blocks but keeps the plan for lineage, so
    planning/serialization time grows exponentially even though rows and
    block counts stay constant (measured on a 14-round loop: 0.6 s →
    76 s per round).  Rebuilding from ``to_arrow_refs`` leaves the
    blocks in the object store (the driver only handles refs) and makes
    each round's plan O(1).  Trade-off: truncated lineage can't be
    replayed on block loss, same as any consumed materialization."""
    import ray.data

    return ray.data.from_arrow_refs(ds.to_arrow_refs())


def wide_partitions(floor: int = 64) -> int:
    """Partition count for hash-partitioned wide stages: scales with the
    cluster (2× CPUs) so a 256-node cluster isn't capped at a constant,
    with a floor that keeps per-partition group counts bounded on small
    clusters.  Result is deterministic for a given cluster size."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(floor, 2 * cpus)


# Canonical alnum token pattern shared by text analysis, dedup shingling
# and the sketches (and interpolated into their SQL oracles) — one
# definition so cross-operator token semantics can never diverge.
TOKEN_PATTERN = r"[a-z0-9]+"


def md5_u64(vals) -> "np.ndarray":
    """Low 8 bytes of md5(str(int(v))), little-endian, as uint64 — the
    exact value DuckDB's ``md5_number_lower(v::VARCHAR)`` computes, used
    by every hash-keyed operator (splits, strata, shards, HLL) so the
    SQL oracles stay bit-exact.  One definition; do not re-implement."""
    import hashlib

    import numpy as np

    out = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        out[i] = int.from_bytes(
            hashlib.md5(str(int(v)).encode("ascii")).digest()[8:], "little"
        )
    return out


def partitioned_by_key(ds, key_col: str, kernel, P: int | None = None):
    """Partition-vectorized per-key execution: the scalable replacement
    for ``groupby(key).map_groups(per_key_fn)`` when the key has
    unbounded cardinality (e.g. user_id at 10⁹ users = 10⁹ Python
    invocations and 10⁹ tiny Arrow tables).

    Appends ``pk = key % P`` (P = wide_partitions(), scales with the
    cluster) and runs ONE ``kernel(partition_table)`` call per hash
    partition — every key's rows are co-located, so the kernel computes
    all per-key results at once with a numpy lexsort + run-boundary
    sweep (see ``run_bounds``).  Same single keyed shuffle as the naive
    shape, but UDF calls are bounded by P instead of key cardinality —
    the pattern dedup.ngram_jaccard_pairs and salted_event_stats
    established.  The kernel receives (and should ignore/drop) the
    ``pk`` column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if P is None:
        P = wide_partitions()

    def add_pk(batch):
        k = pc.cast(batch.column(key_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return batch.append_column(
            "pk", pa.array((k % P).astype("int32"), pa.int32())
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .map_groups(kernel, batch_format="pyarrow")
    )


def batch_distinct_int64(column: str):
    """Per-batch distinct int64 values of ``column`` — the standard
    build-side pre-dedup before a keyed shuffle (shrinks wire volume
    roughly rows/distinct× per block).  Shared by
    distinct_estimators_report and customers_without_events' shuffle
    anti arm."""
    import numpy as np
    import pyarrow as pa

    def fn(batch: "pa.Table") -> "pa.Table":
        u = np.unique(batch.column(column).to_numpy(zero_copy_only=False))
        return pa.table({column: pa.array(u, pa.int64())})

    return fn


def blake2_u63(strs) -> "np.ndarray":
    """blake2b-8 (>>1, non-negative int64) of each UTF-8 string — the
    stable cross-process hash for partitioning STRING keys (Python's
    builtin ``hash`` is per-process salted and cannot key a shuffle;
    this matches the convention dedup's shingle hashing uses).  Python
    loop by necessity, but it runs in a narrow pre-shuffle stage over
    the key column only."""
    import hashlib

    import numpy as np

    out = np.empty(len(strs), dtype=np.int64)
    for i, s in enumerate(strs):
        out[i] = (
            int.from_bytes(
                hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(),
                "big",
            )
            >> 1
        )
    return out


def run_bounds(sorted_key) -> "np.ndarray":
    """Boundaries of equal-key runs in an already-sorted array: returns
    indices b with len = #runs+1 so run i spans [b[i], b[i+1]).  The
    companion sweep primitive for partitioned_by_key kernels."""
    import numpy as np

    if len(sorted_key) == 0:
        return np.zeros(1, dtype=np.int64)
    return np.flatnonzero(
        np.r_[True, sorted_key[1:] != sorted_key[:-1], True]
    ).astype(np.int64)


def money_cents(values) -> "np.ndarray":
    """floor(x*100 + 0.5) as int64 — THE fixed-point money/value rule every
    pricing operator and its DuckDB oracle share (floor+0.5 agrees across
    numpy and DuckDB where round() half-modes differ).  One definition; do
    not re-implement inline."""
    import numpy as np

    return np.floor(np.asarray(values, dtype=np.float64) * 100 + 0.5).astype(
        np.int64
    )


def quantile_disc_pick(values, cum_counts, permille: int) -> int:
    """THE discrete-quantile pick every exact-percentile operator and its
    DuckDB oracle share: quantile_disc's 1-based ceil(q*n) rule over a
    sorted (value, cumulative count) run-length table.  One definition;
    do not re-implement inline (drifted guards change which element a
    query pins and silently break oracle parity)."""
    import numpy as np

    n = int(cum_counts[-1]) if len(cum_counts) else 0
    if n == 0:
        raise ValueError("quantile over an empty distribution")
    idx = int(np.ceil((permille / 1000.0) * n))
    pos = int(np.searchsorted(cum_counts, max(idx, 1)))
    return int(values[min(pos, len(values) - 1)])


GRAM_BASE = 1099511628211  # FNV-1a 64-bit prime (uint64 wraparound base)

import re as _re

_TOKEN_RE_C = _re.compile(TOKEN_PATTERN)


def batch_window_hashes(batch, k: int):
    """Vectorized K-token-window gram hashing for a whole Arrow batch of
    (doc_id, text) rows — the shared emitter behind the exact-substring
    dup family, n-gram shingling and contamination probes.

    Tokens hash ONCE per distinct token (blake2_u63, process-stable);
    window grams are a base-B polynomial over the token hashes computed
    with one sliding-window multiply-add over the batch's concatenated
    token stream (uint64 wraparound; >>1 keeps grams in the
    non-negative int64 domain, disjoint from negative per-doc
    sentinels).  Windows straddling a doc boundary are masked by index
    arithmetic.  Python work is O(docs + tokens) — tokenize + token-id
    lookup — never O(windows).  Hash values are grouping-only: any
    consistent ~injective 63-bit function works wherever this is used
    (the SQL oracles group/join on STRING grams; collision odds stay
    ~n²/2⁶³).

    Returns (doc_ids, n_tokens_per_doc, gram, doc_index, pos) where the
    last three are per-valid-window arrays and doc_index indexes into
    doc_ids/n_tokens_per_doc."""
    import numpy as np

    tok_re = _TOKEN_RE_C
    texts = batch.column("text").to_pylist()
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
    tok_lists = [tok_re.findall(t.lower()) for t in texts]
    lens = np.fromiter((len(ts) for ts in tok_lists), np.int64, len(tok_lists))
    flat_toks = [t for ts in tok_lists for t in ts]
    if flat_toks:
        uniq = list(dict.fromkeys(flat_toks))
        hmap = dict(zip(uniq, blake2_u63(uniq).astype(np.uint64)))
        flat = np.fromiter(
            (hmap[t] for t in flat_toks), np.uint64, len(flat_toks)
        )
    else:
        flat = np.empty(0, np.uint64)
    n = flat.size
    if n < k:
        e = np.empty(0, np.int64)
        return doc_ids, lens, e, e, e
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        pows = np.ones(k, np.uint64)
        for j in range(1, k):
            pows[j] = pows[j - 1] * np.uint64(GRAM_BASE)
        wins = np.lib.stride_tricks.sliding_window_view(flat, k)
        H = (wins * pows).sum(axis=1, dtype=np.uint64) >> np.uint64(1)
    starts = np.concatenate(([0], np.cumsum(lens)))
    gidx = np.arange(n - k + 1)
    doc_of = np.searchsorted(starts, gidx, side="right") - 1
    valid = gidx + k <= starts[doc_of + 1]
    gdoc = doc_of[valid]
    gpos = (gidx[valid] - starts[gdoc]).astype(np.int64)
    gram = H[valid].astype(np.int64)
    return doc_ids, lens, gram, gdoc.astype(np.int64), gpos


def batch_distinct_window_hashes(batch, k: int):
    """batch_window_hashes reduced to per-doc DISTINCT gram sets:
    returns (doc_ids, n_tokens_per_doc, sh_doc_index, sh_gram) with one
    row per distinct (doc, gram) pair — one lexsort + run-boundary
    sweep, no per-doc Python."""
    import numpy as np

    doc_ids, lens, gram, gdoc, _ = batch_window_hashes(batch, k)
    if not gram.size:
        e = np.empty(0, np.int64)
        return doc_ids, lens, e, e
    order = np.lexsort((gram, gdoc))
    g2, d2 = gram[order], gdoc[order]
    first = np.concatenate(
        ([True], (np.diff(d2) != 0) | (np.diff(g2) != 0))
    )
    return doc_ids, lens, d2[first], g2[first]


def ensure_columns(df, columns):
    """Post-aggregation safety for the columnless empty-groupby frame:
    ``Dataset.groupby(...).aggregate(...).to_pandas()`` on an EMPTY
    dataset yields a frame with no columns at all, so any column access
    raises KeyError.  Returns ``df`` untouched when the columns exist,
    else an empty frame with exactly ``columns``.  One definition —
    every bounded to_pandas rollup that then selects columns should go
    through this."""
    import pandas as pd

    if all(c in df.columns for c in columns):
        return df
    return pd.DataFrame({c: pd.Series(dtype=object) for c in columns})
