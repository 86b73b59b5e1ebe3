"""Property-based robustness: the kernel must never raise on arbitrary
input, and span chunking must never change the result (the reference
swallows all HTML malformations — content_handler.go:129-131)."""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st

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
# Round-3 Hypothesis counterexample: a quote right after '=' in a
# malformed end tag starts a quoted value that swallows '>' and runs to
# EOF — the fast regex used to emit END_TAG div [0,17) here.
@example(html='</div/="<p/q r=s>')
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


# -- combiner laws for the wide-operator partials (pure pyarrow, no Ray) ----
#
# Every "pre-aggregate in the batch, roll up in the groupby" operator is
# only correct if its partial is a homomorphism: combining per-chunk
# partials must equal the partial of the whole.  These pin that law on
# random inputs for the newest combiners.

_cap_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10_000),
              st.sampled_from(["a", "b", "c", "d"])),
    min_size=0, max_size=60, unique_by=lambda t: t[0],
)


@given(_cap_rows, st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=60, deadline=None)
def test_domain_cap_combiner_law(rows, n, k):
    import pyarrow as pa

    from go_boilerpipe_ray.functions.sampling import lowest_n_per_source as cap

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    # Split into k chunks, cap each, concat, cap again == cap whole.
    chunks = [tbl.slice(i * (len(rows) // k + 1), len(rows) // k + 1) for i in range(k)]
    partial = pa.concat_tables([cap(c, n) for c in chunks])
    got = cap(partial, n).to_pylist()
    want = cap(tbl, n).to_pylist()
    key = lambda r: (r["source"], r["doc_id"])
    assert sorted(got, key=key) == sorted(want, key=key)


@given(st.lists(st.floats(min_value=0, max_value=500, allow_nan=False),
                min_size=0, max_size=80),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=60, deadline=None)
def test_histogram_partial_additive(vals, k):
    import collections

    import numpy as np
    import pyarrow as pa

    from go_boilerpipe_ray.functions.sketches import _hist_partial

    def to_tbl(vs):
        return pa.table({"value": pa.array(vs, pa.float64())})

    whole = _hist_partial(to_tbl(vals)).to_pylist() if vals else []
    merged: collections.Counter = collections.Counter()
    step = len(vals) // k + 1
    for i in range(k):
        part = vals[i * step:(i + 1) * step]
        if part:
            for r in _hist_partial(to_tbl(part)).to_pylist():
                merged[r["bin"]] += r["cnt"]
    assert merged == collections.Counter(
        {r["bin"]: r["cnt"] for r in whole}
    )


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=8, max_size=8,
        ),
        min_size=2, max_size=6,
    )
)
@settings(max_examples=80, deadline=None)
def test_semdedup_integer_cosine_matches_float_off_boundary(vectors):
    """The exact-integer cosine test agrees with float cosine whenever
    the pair is clearly off the 0.99 boundary (the integer test is the
    tie-free ground truth; float only disagrees within quantization
    noise of the threshold)."""
    import math

    import numpy as np

    from go_boilerpipe_ray.functions.similarity import (
        SEMDEDUP_COS2_BP,
        _quantize,
    )

    m = np.asarray(vectors, dtype=np.float64)
    if np.any(np.linalg.norm(m, axis=1) < 1e-3):
        return  # near-zero vectors: cosine undefined / quantizes to 0
    q = _quantize(m).tolist()
    n2 = [sum(x * x for x in row) for row in q]
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            if n2[i] == 0 or n2[j] == 0:
                continue
            ab = sum(x * y for x, y in zip(q[i], q[j]))
            int_verdict = ab > 0 and ab * ab * 10000 >= SEMDEDUP_COS2_BP * n2[i] * n2[j]
            cos = float(
                m[i] @ m[j] / (np.linalg.norm(m[i]) * np.linalg.norm(m[j]))
            )
            if abs(cos - math.sqrt(SEMDEDUP_COS2_BP / 10000.0)) > 1e-4:
                assert int_verdict == (cos >= 0.99), (i, j, cos, int_verdict)


# Round-4 hardening (the round-3 harness found a real fast-path
# divergence): a nastier alphabet aimed at the remaining fast paths —
# raw-text `</script ` tails, CR/NUL inside attributes, `<!` bogus
# comments, CDATA-ish and processing-instruction openers.
_nasty_soup = st.lists(
    st.sampled_from(
        list("ab<>/='\"\r\n\x00 \t-!?")
        + [
            "<script>", "</script", "</script ", "</script/>", "</script\t",
            "<script a='", "<!--", "-->", "--!>", "<!-", "<!doctype h",
            "<?php", "</ ", "<style>", "</style", "<textarea>",
            "</textarea >", "<title>", "</title\t>", "<![CDATA[", "]]>",
            "<!>", "<a b\x00c=d>", "=\r", "=\x00", "<a a=\"", "<a a='",
        ]
    ),
    max_size=80,
).map("".join)


@settings(max_examples=400, deadline=None)
@given(_nasty_soup)
def test_fast_tag_scan_matches_char_parser_nasty(html):
    from go_boilerpipe_ray.kernel.htmltok import Tokenizer

    fast = [(t[0], t[1], t[3], t[4]) for t in Tokenizer(html, fast=True)]
    slow = [(t[0], t[1], t[3], t[4]) for t in Tokenizer(html, fast=False)]
    assert fast == slow


@settings(max_examples=200, deadline=None)
@given(_nasty_soup)
def test_kernel_never_raises_nasty(html):
    doc = parse_document(html)
    article_pipeline().process(doc)
    doc.content()


# -- repartition_join differential vs a pandas reference ----------------------

_join_case = st.tuples(
    st.lists(st.integers(min_value=0, max_value=8), min_size=0, max_size=30),
    st.lists(st.integers(min_value=0, max_value=8), min_size=0, max_size=15),
    st.sampled_from(["inner", "left", "semi", "anti"]),
    st.integers(min_value=1, max_value=3),
    st.booleans(),  # bloom_prefilter
)


@settings(max_examples=25, deadline=None)
@given(_join_case)
def test_repartition_join_matches_pandas(case):
    """Differential: every join type × probe_salt against a pandas
    reference on a tiny keyspace (forces 1:N fan-out, misses on both
    sides, empty sides)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from go_boilerpipe_ray.functions.relational import repartition_join

    lkeys, rkeys, how, salt, bloom = case
    lv = np.arange(len(lkeys), dtype=np.int64)
    rv = np.arange(len(rkeys), dtype=np.int64) + 1000
    left = ray.data.from_arrow(
        pa.table({"lk": pa.array(lkeys, pa.int64()), "lv": pa.array(lv)})
    )
    right = ray.data.from_arrow(
        pa.table({"rk": pa.array(rkeys, pa.int64()), "rv": pa.array(rv)})
    )
    out = repartition_join(
        left,
        right,
        "lk",
        "rk",
        [("lv", pa.int64())],
        [] if how in ("semi", "anti") else [("rv", pa.int64())],
        how=how,
        probe_salt=salt,
        bloom_prefilter=bloom,
    ).to_pandas()

    ldf = pd.DataFrame({"lk": lkeys, "lv": lv})
    rdf = pd.DataFrame({"rk": rkeys, "rv": rv})
    if how in ("inner", "left"):
        ref = ldf.merge(
            rdf, left_on="lk", right_on="rk",
            how=how if how == "inner" else "left",
        )[["lv", "rv"]]
        got = out.reindex(columns=["lv", "rv"])
        ref = ref.astype("float64").sort_values(["lv", "rv"]).reset_index(drop=True)
        got = got.astype("float64").sort_values(["lv", "rv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
    else:
        rset = set(rkeys)
        keep = [k in rset if how == "semi" else k not in rset for k in lkeys]
        ref = sorted(lv[np.asarray(keep, bool)].tolist())
        got = sorted(out["lv"].tolist()) if len(out) else []
        assert got == ref


# -- session-6 kernel differentials vs in-test references ---------------------

_events_case = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user
        st.integers(min_value=0, max_value=2000),   # ts offset, seconds
        st.integers(min_value=-500, max_value=500), # value, cents
    ),
    min_size=0,
    max_size=25,
)


def _write_events(tmpdir, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_700_000_000_000_000  # µs epoch
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + r[1] * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "value": pa.array([r[2] / 100.0 for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, f"{tmpdir}/events.parquet")
    return tmpdir


@settings(max_examples=20, deadline=None)
@given(_events_case)
def test_interval_coverage_property(rows):
    """Differential vs a sequential interval-merge reference on random
    (user, ts) sets — duplicate timestamps, touching pads, single-event
    users, empty input."""
    import tempfile

    from go_boilerpipe_ray.functions.relational import interval_coverage

    PAD = 300_000_000
    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        got = {
            r["user_id"]: (r["n_islands"], r["covered_us"])
            for r in interval_coverage(d).take_all()
        }
    want = {}
    by_user: dict[int, list[int]] = {}
    base = 1_700_000_000_000_000
    for u, s, _ in rows:
        by_user.setdefault(u, []).append(base + s * 1_000_000)
    for u, ts in by_user.items():
        ts.sort()
        islands, cov, start, end = 0, 0, ts[0], ts[0] + PAD
        for t in ts[1:]:
            if t > end:
                islands, cov = islands + 1, cov + (end - start)
                start, end = t, t + PAD
            else:
                end = t + PAD
        want[u] = (islands + 1, cov + (end - start))
    assert got == want


@settings(max_examples=20, deadline=None)
@given(_events_case)
def test_moving_median_3_property(rows):
    """Differential vs a per-window sorted pick, including negative
    cents and duplicate timestamps (event_id breaks ties)."""
    import tempfile

    from go_boilerpipe_ray.functions.relational import moving_median_3

    with tempfile.TemporaryDirectory() as d:
        _write_events(d, rows)
        got = {
            r["event_id"]: r["med_cents"]
            for r in moving_median_3(d).take_all()
        }
    ordered: dict[int, list[tuple]] = {}
    base = 1_700_000_000_000_000
    for eid, (u, s, c) in enumerate(rows):
        ordered.setdefault(u, []).append((base + s * 1_000_000, eid, c))
    want = {}
    for u, seq in ordered.items():
        seq.sort()
        for i in range(1, len(seq) - 1):
            cents = sorted(x[2] for x in seq[i - 1 : i + 2])
            want[seq[i][1]] = cents[1]
    assert got == want


_snm_case = st.tuples(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=5),  # window w
    st.integers(min_value=1, max_value=4),  # prefix length
)


@settings(max_examples=20, deadline=None)
@given(_snm_case)
def test_snm_dup_pairs_property(case):
    """Differential vs an O(n·w) reference over random tiny documents:
    duplicate texts, empty strings, all-equal token counts (one giant
    rank run), w larger than the corpus."""
    import re
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_boilerpipe_ray.functions.dedup import snm_dup_pairs

    texts, w, prefix = case
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            ),
            f"{d}/documents.parquet",
        )
        got = {
            (r["doc_a"], r["doc_b"], r["gap"])
            for r in snm_dup_pairs(d, w=w, prefix=prefix).take_all()
        }
    feats = sorted(
        (len(re.findall(r"\S+", t)), i, t[:prefix]) for i, t in enumerate(texts)
    )
    want = set()
    for i in range(len(feats)):
        for dd in range(1, w + 1):
            if i + dd < len(feats) and feats[i][2] == feats[i + dd][2]:
                want.add((feats[i][1], feats[i + dd][1], dd))
    assert got == want


# -- AllPairs prefix-filtering differential (end-to-end, few examples:
#    each case runs real Ray pipelines) ---------------------------------------

_ap_words = st.lists(
    st.lists(
        st.sampled_from(
            ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
        ),
        min_size=3,
        max_size=10,
    ).map(" ".join),
    min_size=2,
    max_size=5,
)


@settings(max_examples=5, deadline=None)
@given(texts=_ap_words)
def test_allpairs_jaccard_matches_bruteforce_random(tmp_path_factory, texts):
    """Prefix-filtering completeness on RANDOM corpora: the operator's
    pair set must equal brute-force Jaccard over the same shingle sets
    (dup_corpus-expanded) for arbitrary short word documents — guards
    the df-order prefix lemma, the candidate dedup and the set-carry
    verify against corpus shapes the fixed test can't anticipate."""
    import itertools
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_boilerpipe_ray.functions.dedup import allpairs_jaccard, dup_corpus

    d = tmp_path_factory.mktemp("ap")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(list(texts), pa.string()),
            }
        ),
        f"{d}/documents.parquet",
    )
    rows = dup_corpus(str(d)).take_all()
    sets = {}
    for r in rows:
        toks = re.findall(r"[a-z0-9]+", r["text"].lower())
        sets[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        uni = len(sa | sb)
        if 100 * inter >= 70 * uni:
            want.add((a, b, inter, uni))
    got = {
        (r["id_a"], r["id_b"], r["inter"], r["uni"])
        for r in allpairs_jaccard(str(d)).take_all()
    }
    assert got == want


# -- combiner laws for the session-9 partials ---------------------------------

_hs_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=100_000),
              st.integers(min_value=0, max_value=5_000)),
    min_size=0, max_size=80, unique_by=lambda t: t[0],
)


@given(_hs_rows, st.integers(min_value=1, max_value=4))
@settings(max_examples=60, deadline=None)
def test_halfsample_partial_combiner_law(rows, k):
    """The per-batch (replicate, n, s) fold is a homomorphism: summing
    chunk partials must equal the partial of the whole table — the law
    the groupby-Sum rollup silently assumes."""
    import numpy as np
    import pyarrow as pa

    from go_boilerpipe_ray.functions._util import md5_u64

    def partial(ids, nc):
        h = md5_u64(ids)
        reps = np.arange(32, dtype=np.int64)
        mem = (
            (h[:, None] >> reps[None, :].astype(np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        return mem.sum(axis=0), (mem * nc[:, None]).sum(axis=0)

    ids = np.array([r[0] for r in rows], np.int64)
    nc = np.array([r[1] for r in rows], np.int64)
    want_n, want_s = partial(ids, nc)
    got_n = np.zeros(32, np.int64)
    got_s = np.zeros(32, np.int64)
    step = len(rows) // k + 1
    for i in range(k):
        n_i, s_i = partial(ids[i * step : (i + 1) * step], nc[i * step : (i + 1) * step])
        got_n += n_i
        got_s += s_i
    assert np.array_equal(got_n, want_n) and np.array_equal(got_s, want_s)


_hh_rows = st.lists(
    st.integers(min_value=0, max_value=50), min_size=0, max_size=120
)


@given(_hh_rows, st.integers(min_value=1, max_value=5),
       st.integers(min_value=2, max_value=8))
@settings(max_examples=60, deadline=None)
def test_heavy_hitters_candidate_completeness_law(users, k_chunks, k):
    """The documented completeness bound, exercised directly on the
    summary math: for ANY split into blocks and any key with true count
    above total//(k+1) + slack cut, the per-block top-k summaries plus
    the slack must nominate it.  (The operator enforces
    permille*(k+1) > 1000; this pins the underlying inequality the
    guard relies on.)"""
    import numpy as np

    u = np.array(users, np.int64)
    total = len(u)
    if total == 0:
        return
    step = total // k_chunks + 1
    est = {}
    for i in range(k_chunks):
        chunk = u[i * step : (i + 1) * step]
        if not len(chunk):
            continue
        ids, cnt = np.unique(chunk, return_counts=True)
        if len(ids) > k:
            keep = np.argpartition(cnt, len(cnt) - k)[-k:]
            ids, cnt = ids[keep], cnt[keep]
        for x, c in zip(ids, cnt):
            est[int(x)] = est.get(int(x), 0) + int(c)
    slack = total // (k + 1) + 1
    true_counts = {int(x): int(c) for x, c in zip(*np.unique(u, return_counts=True))}
    for x, f in true_counts.items():
        if f > total // (k + 1):  # the provable-nomination regime
            assert est.get(x, 0) + slack > f - 1  # x is present & nominated
            assert x in est  # never evicted from every block
