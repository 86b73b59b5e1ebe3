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
