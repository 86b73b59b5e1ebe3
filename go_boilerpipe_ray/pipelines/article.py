"""End-to-end extraction pipelines, Ray-Data-first.

The hot path is a single narrow actor-pool ``map_batches`` (no shuffle);
the only wide operations are the optional explicit ``repartition`` after
read and the sharded-ingest ``groupby("doc_id")`` reassembly path.  Design
notes for 100 TB scale are inline.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..stages.extract import ExtractDocuments, SizeRoutedExtract, add_doc_bytes

# Defaults sized so that batch_size × avg doc size stays in the tens of MB
# per task (256 × ~50 KB ≈ 13 MB of HTML per call); giant docs are
# dispatched row-at-a-time by the size router.  256 measured faster than
# 128 in four of four interleaved fresh-process draws on the bench corpus
# (8-45%: fewer per-call Arrow assembly/slice overheads per doc); 512 was
# a wash — keep 256 for the smaller memory envelope.
DEFAULT_BATCH_SIZE = 256
DEFAULT_GIANT_THRESHOLD = 4 << 20  # 4 MiB of HTML in one row


def read_spans(path: str, parallelism: int | None = None) -> "ray.data.Dataset":
    """Read a spans table.  Lance is the production format per the north
    rule; this sandbox has no lance package, so parquet is the tested
    reader and read_lance is attempted first behind a capability check."""
    if path.endswith(".lance"):
        if lance_available():
            return ray.data.read_lance(path)
        raise RuntimeError(
            "lance input requested but the lance package is not installed"
        )
    kwargs = {}
    if parallelism:
        kwargs["override_num_blocks"] = parallelism
    if path.endswith((".jsonl", ".json")) or _is_jsonl_dir(path):
        # Crawl dumps commonly arrive as JSONL before any columnar
        # conversion; normalize to the spans schema at the read edge so
        # every downstream stage sees identical Arrow batches.
        ds = ray.data.read_json(path, **kwargs)
        return ds.map_batches(
            _normalize_spans_batch, batch_format="pyarrow", zero_copy_batch=True
        )
    return ray.data.read_parquet(path, **kwargs)


def lance_available() -> bool:
    """True when the lance package AND the Ray bindings are importable —
    the capability gate for the north rule's production format."""
    if not hasattr(ray.data, "read_lance"):
        return False
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def write_spans(ds: "ray.data.Dataset", path: str) -> None:
    """Symmetric sink for ``read_spans``: lance when the path asks for it
    and the package exists (production format per the north rule), else
    partitioned parquet.  A ``.lance`` path without the package fails
    loudly up front instead of mid-stream inside a write task."""
    if path.endswith(".lance"):
        if not lance_available():
            raise RuntimeError(
                "lance output requested but the lance package is not "
                "installed; write parquet or install lance"
            )
        ds.write_lance(path)
        return
    ds.write_parquet(path)


def _is_jsonl_dir(path: str) -> bool:
    import glob
    import os

    return os.path.isdir(path) and bool(
        glob.glob(os.path.join(path, "*.jsonl"))
    ) and not glob.glob(os.path.join(path, "*.parquet"))


def _normalize_spans_batch(batch: pa.Table) -> pa.Table:
    """Cast a JSON-read batch to the canonical spans schema (JSON
    integers arrive as int64; the schema wants int32 offsets)."""
    from ..sources.fixtures import SPANS_SCHEMA

    return batch.select(["doc_id", "spans"]).cast(SPANS_SCHEMA)


def _default_concurrency() -> int:
    """Fixed actor pool at (CPUs - IO headroom): a fixed pool starts all
    actors eagerly (an autoscaling pool ramps too slowly for short jobs),
    and the headroom keeps read/write tasks schedulable — a pool sized to
    ALL cpus starves the upstream read and deadlocks the pipeline.

    Headroom is min(4 per node, max(1, cpus // 4)): measured on the bench
    corpus, 4 spare CPUs beat 8 at 32 cores (pool 28: 14.6s vs pool 24:
    17.1s) while 2 spare collapses (pool 30: 38s, write stalls); at 8
    cores the 25% rule (pool 6) beats pool 7 (49s vs 57s).  The per-node
    cap keeps the headroom proportional on multi-node clusters, where
    every node runs its own share of read/write tasks."""
    import ray

    try:
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 4))
            nodes = max(1, sum(1 for n in ray.nodes() if n.get("Alive", False)))
        else:
            cpus, nodes = 4, 1
    except Exception:
        cpus, nodes = 4, 1
    return max(1, cpus - min(4 * nodes, max(1, cpus // 4)))


def extract_dataset(
    ds: "ray.data.Dataset",
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    with_lineage: bool = False,
    pipeline_names: list[str] | None = None,
) -> "ray.data.Dataset":
    """The narrow hot path: actor-pool map_batches over zero-copy Arrow."""
    if concurrency is None:
        concurrency = _default_concurrency()
    return ds.map_batches(
        ExtractDocuments,
        fn_constructor_kwargs={
            "pipeline_names": pipeline_names,
            "with_lineage": with_lineage,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_with_size_router(
    ds: "ray.data.Dataset",
    *,
    threshold: int = DEFAULT_GIANT_THRESHOLD,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> "ray.data.Dataset":
    """Skew mitigation with a SINGLE scan: tag rows once with their HTML
    byte size, then one actor-pool stage (``SizeRoutedExtract``) whose
    ``__call__`` dispatches internally — small rows in one vector pass,
    giant rows one at a time.  One ReadParquet in the plan; the former
    two-filter-branch design re-executed the read per branch (2× scan
    cost at 100 TB).  A giant doc still costs its extraction time inside
    its batch's task, but the kernel is per-document either way — the
    routing exists to bound per-call memory, which the internal slice
    preserves."""
    sized = ds.map_batches(add_doc_bytes, batch_format="pyarrow", zero_copy_batch=True)
    if concurrency is None:
        concurrency = _default_concurrency()
    return sized.map_batches(
        SizeRoutedExtract,
        fn_constructor_kwargs={"threshold": threshold},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


_REASSEMBLE_EXTRACTOR: ExtractDocuments | None = None


def _reassemble_part(part: pa.Table) -> pa.Table:
    """Concatenate each doc_id's span fragments and extract — for EVERY
    document in the partition with one extractor call (a multi-row
    batch), not one Python call + one-row Arrow table per document.
    Fragment rows may arrive in any order; spans are globally ordered by
    their ``offset`` field, so a plain concat + in-kernel sort
    reassembles the document (the "groupby doc_id, sort by offset" path
    of the north rule).

    The regroup is pure Arrow: dictionary-encode doc_id (one int code
    per doc), integer-argsort the codes into contiguous runs, gather the
    fragment lists once, then rebuild the per-doc list column from the
    flattened span values + reduceat'd run lengths — no per-fragment
    Python objects on this path (the former ``to_pylist`` + extend loop
    built one dict per span)."""
    import numpy as np
    import pyarrow.compute as pc

    global _REASSEMBLE_EXTRACTOR
    if _REASSEMBLE_EXTRACTOR is None:
        _REASSEMBLE_EXTRACTOR = ExtractDocuments()
    spans_type = part.schema.field("spans").type
    if part.num_rows == 0:
        return _REASSEMBLE_EXTRACTOR(part.select(["doc_id", "spans"]))
    ids = part.column("doc_id").combine_chunks()
    spans = part.column("spans").combine_chunks()
    codes = pc.dictionary_encode(ids).indices.to_numpy(zero_copy_only=False)
    order = np.argsort(codes, kind="stable")
    take = pa.array(order, pa.int64())
    ids = ids.take(take)
    spans = spans.take(take)
    codes = codes[order]
    starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
    frag_lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    doc_lens = np.add.reduceat(frag_lens.astype(np.int64), starts)
    offsets = np.concatenate([[0], np.cumsum(doc_lens)])
    regrouped = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pc.list_flatten(spans)
    ).cast(spans_type)
    batch = pa.table(
        {"doc_id": ids.take(pa.array(starts, pa.int64())), "spans": regrouped}
    )
    return _REASSEMBLE_EXTRACTOR(batch)


def reassemble_and_extract(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Sharded-ingest path: input rows carry *fragments* of a document's
    span list (same doc_id on multiple rows).  One shuffle keyed on
    blake2(doc_id) % P co-locates fragments; extraction then runs once
    per PARTITION over a multi-document batch (doc_id is a string — the
    int-keyed shuffle also avoids sorting strings)."""
    from ..functions._util import blake2_u63, wide_partitions

    P = wide_partitions()

    def add_pk(batch: pa.Table) -> pa.Table:
        h = blake2_u63(batch.column("doc_id").to_pylist())
        return batch.append_column(
            "pk", pa.array((h % P).astype("int32"), pa.int32())
        )

    return (
        ds.map_batches(add_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .map_groups(_reassemble_part, batch_format="pyarrow")
    )
