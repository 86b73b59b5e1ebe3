"""Tier-1 conformance: byte-exact parity with the reference on its own
golden corpus (7 real article pages; /root/reference/filter_test.go)."""

from __future__ import annotations

import pytest

from go_boilerpipe_ray.kernel import normurl
from go_boilerpipe_ray.kernel.document import parse_document
from go_boilerpipe_ray.kernel.filters import article_pipeline

from .golden import load_goldens

GOLDENS = load_goldens()

_MONTHS = [
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
]


def _go_date_format(d) -> str:
    # Go's d.Format("January 2, 2006") — in the datetime's own zone.
    return f"{_MONTHS[d.month - 1]} {d.day}, {d.year}"


@pytest.mark.parametrize("golden", GOLDENS, ids=[f"doc{g.index}" for g in GOLDENS])
def test_golden_document(golden):
    doc = parse_document(golden.html)
    article_pipeline().process(doc)

    assert doc.title == golden.title

    u = normurl.parse(golden.url)
    date = u.date() or doc.date
    if golden.date is None:
        assert date is None
    else:
        assert date is not None
        assert _go_date_format(date) == golden.date

    assert str(u) == golden.norm_url

    content = doc.content()
    assert content == golden.content
