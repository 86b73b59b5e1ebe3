"""Property-based robustness: the kernel must never raise on arbitrary
input, and span chunking must never change the result (the reference
swallows all HTML malformations — content_handler.go:129-131)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from go_boilerpipe_ray.kernel.document import parse_document
from go_boilerpipe_ray.kernel.filters import article_pipeline
from go_boilerpipe_ray.kernel.spans import content_from_result, extract_from_spans
from go_boilerpipe_ray.sources.fixtures import split_chunks, text_span

_tag_soup = st.lists(
    st.sampled_from(
        list("abc <>/=\"'&;!-?\n\t好⁣")
        + [
            "<p>",
            "</p>",
            "<a href='x'>",
            "</a>",
            "<script>",
            "</script>",
            "<title>",
            "</title>",
            "<body>",
            "</body>",
            "&amp;",
            "&#x41;",
            "&notanentity",
            "<br>",
            "<!--",
            "-->",
            "<time datetime='2020-01-02T03:04:05Z'>",
        ]
    ),
    max_size=120,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(_tag_soup)
def test_kernel_never_raises(html):
    doc = parse_document(html)
    article_pipeline().process(doc)
    doc.content()


@settings(max_examples=100, deadline=None)
@given(_tag_soup, st.integers(min_value=1, max_value=7))
def test_chunking_invariance(html, k):
    whole = extract_from_spans([text_span(html, 0)])
    chunked = extract_from_spans(
        [text_span(c, i) for i, c in enumerate(split_chunks(html, k))]
    )
    assert content_from_result(whole) == content_from_result(chunked)
    assert whole.title == chunked.title


_attr_soup = st.lists(
    st.sampled_from(
        list("ab =/\"'<>&\t\n")
        + ["<div", "<a href=", "'v'", '"w"', "</div", ">", "/>", "<span a", "=x", "<p/q r=s>"]
    ),
    max_size=60,
).map("".join)


@settings(max_examples=300, deadline=None)
@given(_attr_soup)
def test_fast_tag_scan_matches_char_parser(html):
    from go_boilerpipe_ray.kernel.htmltok import Tokenizer

    fast = [(t[0], t[1], t[3], t[4]) for t in Tokenizer(html, fast=True)]
    slow = [(t[0], t[1], t[3], t[4]) for t in Tokenizer(html, fast=False)]
    assert fast == slow


# Alphabet exercising every tokenize() path: word chars (incl. Unicode
# letters), glue punctuation, other symbols, spaces, and the literal
# U+2063 invisible separator the reference's 3-pass tokenizer inserts.
_tok_text = st.text(
    alphabet=list("abcXYZ019_ .,-!@:;$?()/'\"%€~<>$⁣\t 　é漢"),
    max_size=60,
)


@given(_tok_text)
@settings(max_examples=400, deadline=None)
def test_tokenize_matches_reference_3pass(text):
    from go_boilerpipe_ray.kernel.handler import _tokenize_reference, tokenize

    assert tokenize(text) == _tokenize_reference(text)
