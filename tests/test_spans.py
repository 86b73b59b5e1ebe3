"""Tier-2: span-sequence semantics of the pure kernel (no Ray).

F1 single-span, F2 chunked/reversed reassembly, F3 media carry-through —
all must reproduce the reference Content() byte-exact."""

from __future__ import annotations

import pytest

from go_boilerpipe_ray.kernel.spans import content_from_result, extract_from_spans
from go_boilerpipe_ray.sources.fixtures import (
    golden7_chunked_table,
    golden7_interleaved_table,
    golden7_table,
    split_chunks,
)

from .golden import load_goldens

GOLDENS = load_goldens()


def _rows(table):
    return list(
        zip(table.column("doc_id").to_pylist(), table.column("spans").to_pylist())
    )


def test_f1_single_span_matches_reference_content():
    for (doc_id, spans), g in zip(_rows(golden7_table()), GOLDENS):
        res = extract_from_spans(spans)
        assert res.error == ""
        assert res.title == g.title
        assert content_from_result(res) == g.content, doc_id


@pytest.mark.parametrize("k", [2, 3, 8])
@pytest.mark.parametrize("reverse", [False, True])
def test_f2_chunked_reassembly(k, reverse):
    for (doc_id, spans), g in zip(
        _rows(golden7_chunked_table(k, reverse=reverse)), GOLDENS
    ):
        res = extract_from_spans(spans)
        assert content_from_result(res) == g.content, (doc_id, k, reverse)
        assert res.title == g.title


def test_f3_media_carry_through():
    for (doc_id, spans), g in zip(_rows(golden7_interleaved_table(3)), GOLDENS):
        res = extract_from_spans(spans)
        # Text spans identical to F1.
        assert content_from_result(res) == g.content, doc_id
        # All media spans carried through, in offset order.
        media_in = [s for s in spans if s["kind"] != "text"]
        media_out = [s for s in res.spans if s[0] != "text"]
        assert [m[2] for m in media_out] == [m["media_ref"] for m in media_in]
        # order is dense 0..n-1
        assert [s[3] for s in res.spans] == list(range(len(res.spans)))


def test_split_chunks_roundtrip():
    s = "abcdéfghij🎈klm"
    for k in (1, 2, 3, 5, 20):
        assert "".join(split_chunks(s, k)) == s


def test_error_rows_do_not_raise():
    res = extract_from_spans(
        [{"kind": "text", "text": None, "media_ref": "", "offset": 0}]
    )
    assert res.error != ""
    assert res.spans == []
