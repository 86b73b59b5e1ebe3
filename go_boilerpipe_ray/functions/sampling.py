"""Deterministic sampling / split assignment for training corpora.

The selector is a pure function of the row key (md5 of the decimal doc id,
matching DuckDB's ``md5_number_lower``), so splits are reproducible across
runs, machines and cluster sizes, and need no shuffle, no global count and
no stored split table: at 100 TB every worker decides membership locally
from the key alone.  This is the standard "salted hash split" used to hold
out eval data from a training corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ._util import read_parquet_clean

# (name, permille upper bound): train = [0, 980), valid = [980, 990),
# test = [990, 1000).  Mirrored exactly by SAMPLE_SPLIT_SQL.
_SPLIT_BOUNDS = (("train", 980), ("valid", 990), ("test", 1000))


def _key_permille(ids: np.ndarray) -> np.ndarray:
    out = np.empty(len(ids), dtype=np.int64)
    for i, v in enumerate(ids):
        h = int.from_bytes(
            hashlib.md5(str(int(v)).encode("ascii")).digest()[8:], "little"
        )
        out[i] = h % 1000
    return out


def _split_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    pm = _key_permille(ids)
    names = np.empty(len(ids), dtype=object)
    lo = 0
    for name, hi in _SPLIT_BOUNDS:
        names[(pm >= lo) & (pm < hi)] = name
        lo = hi
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "split": pa.array(list(names), pa.string()),
        }
    )


def sample_split(sf_dir: str) -> "ray.data.Dataset":
    """Assign every document a deterministic train/valid/test split."""
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(
        _split_batch, batch_format="pyarrow", zero_copy_batch=True
    )


SAMPLE_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN md5_number_lower(doc_id::VARCHAR) % 1000 < 980 THEN 'train'
            WHEN md5_number_lower(doc_id::VARCHAR) % 1000 < 990 THEN 'valid'
            ELSE 'test' END AS split
FROM documents
"""


STRATIFIED_K = 20


def stratified_sample(sf_dir: str, k: int = STRATIFIED_K) -> "ray.data.Dataset":
    """Exactly-k-per-stratum sample: within each language, keep the k
    documents with the smallest key hash (deterministic — no RNG state,
    reproducible on any cluster size).  One shuffle on the stratum key;
    the per-group top-k is a vectorized argpartition.  At crawl scale a
    stratum is still one group — for huge strata, pre-filter with a
    permille threshold slightly above k/N per stratum (local, no
    shuffle) before the exact per-group top-k."""
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = np.empty(len(ids), dtype=np.uint64)
        for i, v in enumerate(ids):
            h[i] = int.from_bytes(
                hashlib.md5(str(int(v)).encode("ascii")).digest()[8:], "little"
            )
        return batch.append_column("h", pa.array(h.astype(np.int64), pa.int64()))

    def topk(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "lang": group.column("lang").take(pa.array(order, pa.int64())),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(topk, batch_format="pyarrow")
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (
    PARTITION BY lang ORDER BY md5_number_lower(doc_id::VARCHAR), doc_id
) <= {STRATIFIED_K}
"""
