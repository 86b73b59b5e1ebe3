"""URL scalar functions as a Ray Data batch stage (SURVEY §2.E).

The reference's normurl package is side-metadata tooling; here it is a
narrow vectorized-per-batch stage usable on any dataset with a ``url``
column: normalization, host/root split, and date-from-URL extraction.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..kernel.normurl import URL, date_from_url


def _normalize_batch(batch: pa.Table) -> pa.Table:
    norm: list[str] = []
    hosts: list[str] = []
    roots: list[str] = []
    dates: list[object] = []
    for raw in batch.column("url").to_pylist():
        try:
            u = URL(raw)
            s = str(u)
            norm.append(s)
            hosts.append(u.hostname())
            roots.append(u.root())
            dates.append(date_from_url(s))
        except Exception:
            norm.append("")
            hosts.append("")
            roots.append("")
            dates.append(None)
    return batch.append_column(
        "url_norm", pa.array(norm, pa.string())
    ).append_column("url_host", pa.array(hosts, pa.string())).append_column(
        "url_root", pa.array(roots, pa.string())
    ).append_column(
        "url_date", pa.array(dates, pa.timestamp("us", tz="UTC"))
    )


def normalize_urls(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Append url_norm / url_host / url_root / url_date columns."""
    return ds.map_batches(
        _normalize_batch, batch_format="pyarrow", zero_copy_batch=True
    )
