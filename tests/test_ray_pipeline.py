"""Tier-3: Ray Data pipeline equivalence with the pure kernel.

The full Ray job (read parquet → actor-pool map_batches → collect) must
produce, per row, exactly the kernel's output: same (kind, text, media_ref,
order) span sequence, same metadata — for single-span, chunked, interleaved
and sharded-fragment variants of the same documents."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from go_boilerpipe_ray.kernel.spans import extract_from_spans
from go_boilerpipe_ray.pipelines.article import (
    extract_dataset,
    extract_with_size_router,
    read_spans,
    reassemble_and_extract,
)
from go_boilerpipe_ray.sources.fixtures import (
    golden7_chunked_table,
    golden7_interleaved_table,
    golden7_table,
    spans_table,
)


def _expected(table):
    out = {}
    for doc_id, spans in zip(
        table.column("doc_id").to_pylist(), table.column("spans").to_pylist()
    ):
        res = extract_from_spans(spans)
        out[doc_id] = res
    return out


def _collect(ds):
    rows = {}
    for row in ds.take_all():
        rows[row["doc_id"]] = row
    return rows


def _assert_matches(actual_rows, expected):
    assert set(actual_rows) == set(expected)
    for doc_id, exp in expected.items():
        act = actual_rows[doc_id]
        act_spans = [
            (s["kind"], s["text"], s["media_ref"], s["order"])
            for s in act["spans"]
        ]
        assert act_spans == exp.spans, doc_id
        assert act["title"] == exp.title
        assert act["author"] == exp.author
        assert act["error"] == exp.error
        assert act["n_blocks_kept"] == exp.n_blocks_kept


@pytest.fixture(scope="module")
def corpus_paths(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("spans")
    paths = {}
    for name, table in [
        ("f1", golden7_table()),
        ("f2", golden7_chunked_table(3, reverse=True)),
        ("f3", golden7_interleaved_table(3)),
    ]:
        p = os.path.join(d, f"{name}.parquet")
        pq.write_table(table, p)
        paths[name] = (p, table)
    return paths


@pytest.mark.parametrize("name", ["f1", "f2", "f3"])
def test_ray_matches_kernel(corpus_paths, name):
    path, table = corpus_paths[name]
    ds = extract_dataset(read_spans(path), batch_size=4)
    _assert_matches(_collect(ds), _expected(table))


def test_size_router_paths_equal(corpus_paths):
    path, table = corpus_paths["f2"]
    # Force every doc through the giant path with threshold=0, then the
    # small path with a huge threshold: identical output either way.
    ds_giant = extract_with_size_router(read_spans(path), threshold=0)
    ds_small = extract_with_size_router(read_spans(path), threshold=1 << 40)
    exp = _expected(table)
    _assert_matches(_collect(ds_giant), exp)
    _assert_matches(_collect(ds_small), exp)


def test_sharded_fragments_reassemble(corpus_paths, tmp_path):
    # Split each doc's span list across 3 rows (fragments out of order);
    # groupby(doc_id) must reassemble to the same result.
    _, table = corpus_paths["f3"]
    rows = []
    for doc_id, spans in zip(
        table.column("doc_id").to_pylist(), table.column("spans").to_pylist()
    ):
        frags = [spans[0::3], spans[2::3], spans[1::3]]
        for fr in frags:
            if fr:
                rows.append((doc_id, fr))
    frag_table = spans_table(rows)
    p = os.path.join(tmp_path, "frags.parquet")
    pq.write_table(frag_table, p)

    ds = reassemble_and_extract(read_spans(p))
    _assert_matches(_collect(ds), _expected(table))


def test_giant_doc_size_router(ray_session, tmp_path):
    # A genuinely giant doc (repeated body, ~3 MB HTML) plus small docs:
    # the router must split paths and still match the kernel per-row.
    import pyarrow.parquet as pq

    from go_boilerpipe_ray.sources.fixtures import (
        spans_table,
        synthetic_spans_for_document,
    )

    text = "spark merge filter window batch stream value column " * 600
    rows = []
    for doc_id in (3, 9):  # doc 9 giant (giant_every=10 → id%10==9), doc 3 small
        rows.append(
            (f"syn-{doc_id:06d}", synthetic_spans_for_document(doc_id, text, giant_every=10))
        )
    table = spans_table(rows)
    giant_bytes = sum(len(s["text"]) for s in table.column("spans")[1].as_py())
    assert giant_bytes > 1 << 20  # really giant

    p = os.path.join(tmp_path, "giant.parquet")
    pq.write_table(table, p)
    ds = extract_with_size_router(read_spans(p), threshold=1 << 20)

    # Single-scan contract: exactly ONE read operator in the logical plan
    # (the round-2 two-filter-branch router re-executed the read per
    # branch — 2× scan cost at 100 TB).
    def count_reads(op) -> int:
        n = 1 if "Read" in type(op).__name__ or "Read" in str(op) else 0
        return n + sum(count_reads(dep) for dep in op.input_dependencies)

    assert count_reads(ds._plan._logical_plan.dag) == 1

    _assert_matches(_collect(ds), _expected(table))


def test_jsonl_source_matches_parquet_source(tmp_path):
    """The JSONL reader path must yield byte-identical extraction output
    to the parquet path on the same documents."""
    import json

    import pyarrow.parquet as pq

    from go_boilerpipe_ray.pipelines.article import extract_dataset, read_spans
    from go_boilerpipe_ray.sources.fixtures import cached_synthetic_corpus

    pq_path = cached_synthetic_corpus("/root/testdata/sf0.001")
    t = pq.read_table(pq_path)
    head = t.slice(0, 40)
    jl = tmp_path / "spans.jsonl"
    with open(jl, "w") as f:
        for row in head.to_pylist():
            f.write(json.dumps(row) + "\n")

    def result_map(ds):
        return {
            r["doc_id"]: (r["title"], [s["text"] for s in r["spans"]])
            for r in ds.take_all()
        }

    import ray.data

    got = result_map(extract_dataset(read_spans(str(jl))))
    want_ds = ray.data.from_arrow(head)
    want = result_map(extract_dataset(want_ds))
    assert got == want and len(got) == 40


def test_write_spans_parquet_roundtrip(ray_session, tmp_path):
    """write_spans is the symmetric sink for read_spans: parquet always
    works; the lance branch is capability-gated below."""
    import ray.data

    from go_boilerpipe_ray.pipelines.article import write_spans
    from go_boilerpipe_ray.sources.fixtures import cached_synthetic_corpus

    t = pq.read_table(cached_synthetic_corpus("/root/testdata/sf0.001")).slice(0, 20)
    out_dir = str(tmp_path / "spans_out")
    write_spans(ray.data.from_arrow(t), out_dir)
    back = read_spans(out_dir).take_all()
    assert sorted(r["doc_id"] for r in back) == sorted(
        t.column("doc_id").to_pylist()
    )


def test_write_spans_lance_gate(ray_session, tmp_path):
    """Without the lance package, a .lance sink must fail loudly up front;
    with it, the round-trip must work (runs only where lance exists)."""
    import ray.data

    from go_boilerpipe_ray.pipelines.article import lance_available, write_spans
    from go_boilerpipe_ray.sources.fixtures import cached_synthetic_corpus

    t = pq.read_table(cached_synthetic_corpus("/root/testdata/sf0.001")).slice(0, 10)
    ds = ray.data.from_arrow(t)
    path = str(tmp_path / "spans.lance")
    if not lance_available():
        with pytest.raises(RuntimeError, match="lance"):
            write_spans(ds, path)
        pytest.skip("lance package not installed; gate behavior verified")
    write_spans(ds, path)
    back = read_spans(path).take_all()
    assert sorted(r["doc_id"] for r in back) == sorted(
        t.column("doc_id").to_pylist()
    )


def test_lance_api_contract(monkeypatch, tmp_path):
    """Pin the exact ray.data lance call signatures the capability gate
    depends on (the sandbox lacks the lance package, so the real-IO
    round-trip above skips — this catches read_lance/write_lance API
    rot without it).  Two layers: (1) the Ray API still exposes the
    entry points with the parameter names we call; (2) with a mocked
    lance module the gate opens and routes the exact path through."""
    import inspect
    import sys
    import types

    import ray.data

    from go_boilerpipe_ray.pipelines import article

    # (1) signature pins — first parameter names are what we pass.
    sig_read = inspect.signature(ray.data.read_lance)
    assert list(sig_read.parameters)[0] == "uri"
    sig_write = inspect.signature(ray.data.Dataset.write_lance)
    assert list(sig_write.parameters)[:2] == ["self", "path"]

    # (2) mocked-module behavior: gate opens, calls route verbatim.
    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    assert article.lance_available()

    calls: dict[str, str] = {}
    sentinel = object()

    def fake_read_lance(uri, **kwargs):
        calls["read"] = uri
        return sentinel

    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance)
    got = article.read_spans(str(tmp_path / "in.lance"))
    assert got is sentinel
    assert calls["read"] == str(tmp_path / "in.lance")

    class FakeDS:
        def write_lance(self, path, **kwargs):
            calls["write"] = path

        def write_parquet(self, path, **kwargs):  # pragma: no cover
            raise AssertionError("lance path must not fall back to parquet")

    article.write_spans(FakeDS(), str(tmp_path / "out.lance"))
    assert calls["write"] == str(tmp_path / "out.lance")


def test_extract_survives_actor_death(corpus_paths, tmp_path, ray_session):
    """Fault tolerance on the hot path (the north rule's resumable-
    restart story at task granularity): an extraction actor whose
    process DIES mid-batch (os._exit, as a preempted node would) is
    restarted by Ray and its batch retried — the pipeline completes
    with output identical to an undisturbed run.  Lineage-based retry
    is what makes checkpoint-free recovery work inside one job; the
    manifest (test_resume) covers cross-job resume."""
    import os as _os

    from go_boilerpipe_ray.stages.extract import ExtractDocuments

    path, table = corpus_paths["f2"]
    marker = str(tmp_path / "killed_once")

    class KillOnceExtract(ExtractDocuments):
        def __call__(self, batch):
            if not _os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("x")
                _os._exit(1)  # hard process death, not an exception
            return super().__call__(batch)

    ds = read_spans(path).map_batches(
        KillOnceExtract,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=4,
        concurrency=2,
    )
    _assert_matches(_collect(ds), _expected(table))
    assert _os.path.exists(marker)  # the death really happened
