"""Extraction-pipeline queries over driver sf dirs.

The synthetic spans corpus is derived deterministically from the driver's
documents table (sources.fixtures.html_for_document), so the <title> the
extractor must recover is SQL-predictable — an oracle-checked end-to-end
test of the whole Ray extraction pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources.fixtures import cached_synthetic_corpus
from .article import extract_dataset, read_spans


def _extract_corpus(sf_dir: str, **kwargs):
    path = cached_synthetic_corpus(sf_dir)
    return extract_dataset(read_spans(path), **kwargs)


def extract_titles(sf_dir: str):
    """(doc_id:int64, title) recovered by full extraction; oracle predicts
    the generator's deterministic <title>."""

    def to_int_ids(batch: pa.Table) -> pa.Table:
        ids = pc.cast(
            pc.utf8_replace_slice(batch.column("doc_id"), 0, 4, ""), pa.int64()
        )
        return pa.table({"doc_id": ids, "title": batch.column("title")})

    return _extract_corpus(sf_dir).map_batches(
        to_int_ids, batch_format="pyarrow", zero_copy_batch=True
    )


EXTRACT_TITLES_SQL = r"""
SELECT doc_id,
       'Doc ' || doc_id || ': ' ||
       array_to_string(list_slice(regexp_extract_all(text, '\S+'), 1, 5), ' ')
       AS title
FROM documents
"""


def extract_authors(sf_dir: str):
    """(doc_id, author) — ld+json author.name for every 7th doc, else ''
    (generator rule mirrored in SQL)."""

    def to_rows(batch: pa.Table) -> pa.Table:
        ids = pc.cast(
            pc.utf8_replace_slice(batch.column("doc_id"), 0, 4, ""), pa.int64()
        )
        return pa.table({"doc_id": ids, "author": batch.column("author")})

    return _extract_corpus(sf_dir).map_batches(
        to_rows, batch_format="pyarrow", zero_copy_batch=True
    )


EXTRACT_AUTHORS_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN 'Author ' || (doc_id % 50) ELSE '' END
       AS author
FROM documents
"""


def extract_stats(sf_dir: str):
    """Per-doc extraction metrics, oracle-checked end-to-end: the
    generator's block structure is a pure function of the document's
    whitespace token count, so EXTRACT_STATS_SQL predicts every metric —
    including words_kept, whose piecewise delta encodes exactly which
    boilerplate blocks (nav links, trailing comment prompts) the filter
    chain merges into the content block at each document length."""

    def to_rows(batch: pa.Table) -> pa.Table:
        ids = pc.cast(
            pc.utf8_replace_slice(batch.column("doc_id"), 0, 4, ""), pa.int64()
        )
        return pa.table(
            {
                "doc_id": ids,
                "n_blocks_in": pc.cast(batch.column("n_blocks_in"), pa.int64()),
                "n_blocks_kept": pc.cast(batch.column("n_blocks_kept"), pa.int64()),
                "words_in": pc.cast(batch.column("words_in"), pa.int64()),
                "words_kept": pc.cast(batch.column("words_kept"), pa.int64()),
                "error": batch.column("error"),
            }
        )

    return _extract_corpus(sf_dir).map_batches(
        to_rows, batch_format="pyarrow", zero_copy_batch=True
    )


# The synthetic article wraps the document text in a fixed template (nav,
# h1 title, 40-word paragraphs, comment prompts, footer), so every metric
# is a function of n_words = count of \S+ tokens (valid for n_words >= 5;
# the driver corpora are 10..100):
#   n_blocks_in  = ceil(n_words/40) + 6   (nav, h1, 2 comments, 2 footer)
#   n_blocks_kept = 1                     (proximity fusion merges content)
#   words_in     = n_words + 33           (all template words)
#   words_kept   = n_words + delta, delta per the measured filter-chain
#                  piecewise (which boilerplate neighbors get merged):
#                  5-17→10, 18-40→16, 41-44→13, 45-59→16, 60+→13.
EXTRACT_STATS_SQL = r"""
WITH w AS (
  SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_words FROM documents
)
SELECT doc_id,
       CAST(ceil(n_words / 40.0) + 6 AS BIGINT) AS n_blocks_in,
       CAST(1 AS BIGINT) AS n_blocks_kept,
       CAST(n_words + 33 AS BIGINT) AS words_in,
       CAST(n_words + CASE
            WHEN n_words >= 60 THEN 13
            WHEN n_words >= 45 THEN 16
            WHEN n_words >= 41 THEN 13
            WHEN n_words >= 18 THEN 16
            ELSE 10 END AS BIGINT) AS words_kept,
       '' AS error
FROM w
"""


def extract_golden(_sf_dir: str):
    """Full pipeline over the reference's golden corpus (rows-only; the
    byte-exact oracle is the Tier-1/Tier-3 pytest suite)."""
    import pyarrow.parquet as pq

    from ..sources.fixtures import golden7_interleaved_table

    import os

    path = "/tmp/gbr_cache/golden7_interleaved.parquet"
    if not os.path.exists(path):
        # Atomic publish (write-to-temp + rename): a concurrent driver
        # must never read a half-written file through the exists-check.
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(golden7_interleaved_table(3), tmp)
        os.replace(tmp, path)

    def project(batch: pa.Table) -> pa.Table:
        n_spans = pc.list_value_length(batch.column("spans"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "title": batch.column("title"),
                "n_spans": pc.cast(n_spans, pa.int64()),
                "n_blocks_kept": pc.cast(batch.column("n_blocks_kept"), pa.int64()),
            }
        )

    return extract_dataset(read_spans(path)).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )


def media_decode(_sf_dir: str):
    """Multimodal plumbing demo: synth media table → actor-pool decode
    stage (stub backend) → features (rows-only; deterministic)."""
    import ray.data

    from ..functions.multimodal import decode_media_dataset, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(200))
    out = decode_media_dataset(ds)
    return out.select_columns(["media_ref", "kind", "width", "height", "decoded"])


def media_resize(_sf_dir: str):
    """Aspect-preserving resize planning over the synth media table
    (rows-only; dimension math is real, pixel work stubbed)."""
    import ray.data

    from ..functions.multimodal import resize_media_dataset, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(200))
    return resize_media_dataset(ds, target=256).select_columns(
        ["media_ref", "kind", "width", "height", "scale_x1000"]
    )


# Mirrors synth_media_table's metadata formulas and the integer resize
# plan exactly; rows generated by range() since the media table is
# synthesized, not an sf-dir table.
MEDIA_RESIZE_SQL = """
WITH m AS (
  SELECT i,
         'media://syn/' || i AS media_ref,
         CASE WHEN i % 3 = 0 THEN 'audio' ELSE 'image' END AS kind,
         64 + (i % 16) * 32 AS w,
         64 + (i % 9) * 32 AS h
  FROM range(0, 200) t(i)
),
p AS (
  SELECT *, greatest(greatest(w, h), 1) AS long_side FROM m
),
q AS (
  SELECT *, least(long_side, 256) AS s FROM p
)
SELECT media_ref, kind,
       CAST(greatest(1, (w * s) // long_side) AS INTEGER) AS width,
       CAST(greatest(1, (h * s) // long_side) AS INTEGER) AS height,
       (1000 * s) // long_side AS scale_x1000
FROM q
"""


def media_frame_sample(_sf_dir: str):
    """Video frame-sampling plumbing over the synth media table: every
    10th frame reference per media item, frame count derived from typed
    metadata (width//8 frames, min 1).  The expansion itself is the real
    distributed fan-out pattern (vectorized repeat inside map_batches)."""
    import ray.data

    from ..functions.multimodal import frame_sample_refs, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(200))
    return frame_sample_refs(ds, every_n=10)


# Mirrors synth_media_table's width formula and the every-10th-frame
# expansion.  DuckDB's range() table function rejects lateral column
# bounds, so the fan-out is a bounded cross join (max possible frame
# steps) filtered by each item's own frame count.
MEDIA_FRAME_SAMPLE_SQL = """
WITH m AS (
  SELECT i,
         'media://syn/' || i AS media_ref,
         greatest((64 + (i % 16) * 32) // 8, 1) AS n_frames
  FROM range(0, 200) t(i)
),
-- widths are 64..544 so n_frames <= 68 -> steps 0,10,..,60 (range() cannot
-- take a subquery bound in DuckDB; the WHERE below enforces per-item counts)
steps AS (
  SELECT CAST(range AS INTEGER) * 10 AS frame_idx FROM range(0, 7)
)
SELECT m.media_ref, s.frame_idx
FROM m CROSS JOIN steps s
WHERE s.frame_idx < m.n_frames
"""


def media_dedup(_sf_dir: str):
    """Exact binary dedup over a media table with CONSTRUCTED duplicate
    structure (row i holds base payload i % 40): the operator hashes the
    opaque bytes and groups by content; the oracle mirrors the
    construction — recovering it proves the binary path end-to-end."""
    import ray.data

    from ..functions.multimodal import media_dedup_dataset, synth_dup_media_table

    ds = ray.data.from_arrow(synth_dup_media_table(200, 40))
    return media_dedup_dataset(ds)


# Mirrors synth_dup_media_table's i % 40 payload assignment: the Ray side
# groups by md5 of the actual bytes; equality of the results proves the
# hash path reconstructs the constructed clusters exactly.
MEDIA_DEDUP_SQL = """
SELECT CAST(min(i) AS BIGINT) AS rep_i,
       CAST(count(*) AS BIGINT) AS n_copies
FROM range(0, 200) t(i)
GROUP BY i % 40
ORDER BY rep_i
"""
