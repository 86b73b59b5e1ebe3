"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes:
- Exact dedup never shuffles full text: a content hash is computed in a
  narrow map_batches, then a small ``groupby(hash).min(doc_id)`` runs on
  (hash, doc_id) pairs only.
- N-gram Jaccard uses the inverted-index pattern, partition-vectorized:
  distinct (doc, shingle-hash) int pairs → hash-partitioned pair emission
  → hash-partitioned pair counting + threshold filter, with doc sizes
  broadcast.  At 100 TB you would additionally cap shingle
  document-frequency (drop stop-shingles) and salt hot shingles; the cap
  is exposed as ``max_df`` (None = exact, used for the oracle-checked
  query).
- MinHash/LSH buckets by band signature: only same-bucket candidates are
  verified, which is the sub-quadratic scale path.

The dedup *inputs* are synthesized from the driver's documents table by a
deterministic, SQL-expressible expansion (originals ∪ exact copies ∪
suffix-perturbed copies) so the operators are exercised on corpora that
actually contain duplicates.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ._util import default_pool

_TOKEN_RE = re.compile(r"[a-z0-9]+")

COPY_OFFSET = 1_000_000
PERTURB_OFFSET = 2_000_000
PERTURB_SUFFIX = " extra token tail"


def dup_corpus(sf_dir: str) -> "ray.data.Dataset":
    """documents ∪ exact copies (id+1e6) ∪ perturbed copies (id+2e6).

    Deterministic and mirrored exactly by DUP_CORPUS_SQL, so dedup
    operators run against a corpus with known duplicate structure.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        texts = batch.column("text")
        out_ids = pa.concat_arrays(
            [
                ids.combine_chunks(),
                pc.add(ids, COPY_OFFSET).combine_chunks(),
                pc.add(ids, PERTURB_OFFSET).combine_chunks(),
            ]
        )
        perturbed = pc.binary_join_element_wise(
            texts, pa.array([PERTURB_SUFFIX] * len(texts)), ""
        )
        out_texts = pa.concat_arrays(
            [
                texts.combine_chunks(),
                texts.combine_chunks(),
                perturbed.combine_chunks(),
            ]
        )
        return pa.table({"doc_id": out_ids, "text": out_texts})

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


DUP_CORPUS_SQL = f"""
SELECT doc_id, text FROM documents
UNION ALL SELECT doc_id + {COPY_OFFSET}, text FROM documents
UNION ALL SELECT doc_id + {PERTURB_OFFSET}, text || '{PERTURB_SUFFIX}' FROM documents
"""


# -- exact dedup ------------------------------------------------------------


def _hash_batch(batch: pa.Table) -> pa.Table:
    hashes = [
        hashlib.sha1(t.encode("utf-8")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return pa.table(
        {"text_hash": pa.array(hashes, pa.string()), "doc_id": batch.column("doc_id")}
    )


def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """Keep the lowest doc_id per identical text: hash in a narrow stage,
    shuffle only (hash, id) pairs."""
    ds = dup_corpus(sf_dir).map_batches(
        _hash_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    kept = ds.groupby("text_hash").min("doc_id")
    return kept.select_columns(["min(doc_id)"]).rename_columns({"min(doc_id)": "doc_id"})


EXACT_DEDUP_SQL = f"""
WITH corpus AS ({DUP_CORPUS_SQL})
SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text
"""


# -- n-gram Jaccard (exact, inverted-index pattern) --------------------------


def _shingle_batch(batch: pa.Table, k: int) -> pa.Table:
    """Distinct (doc_id, shingle-hash) pairs.  Shingles are hashed to
    int64 so the shuffle moves 8-byte keys, never strings; the SQL oracle
    joins on the string shingle — identical pairs absent 64-bit
    collisions."""
    doc_ids: list[int] = []
    shingles: list[int] = []
    for doc_id, t in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        toks = _TOKEN_RE.findall(t.lower())
        seen = {
            int.from_bytes(
                hashlib.blake2b(
                    " ".join(toks[i : i + k]).encode(), digest_size=8
                ).digest(),
                "big",
            )
            >> 1
            for i in range(len(toks) - k + 1)
        }
        doc_ids.extend([doc_id] * len(seen))
        shingles.extend(seen)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "shingle": pa.array(shingles, pa.int64()),
        }
    )


_JACCARD_PARTITIONS = 64


def ngram_jaccard_pairs(
    sf_dir: str, k: int = 3, threshold: float = 0.8, max_df: int | None = None
) -> "ray.data.Dataset":
    """All pairs with shingle-set Jaccard >= threshold (exact when
    max_df=None).

    Inverted-index pattern, partition-vectorized: instead of one
    ``map_groups`` call per shingle (tens of thousands of tiny Python
    invocations) and a row-level groupby over the candidate pairs, both
    wide steps shuffle on a *hash partition* key (a bounded number of
    groups) and run vectorized numpy kernels inside each partition:

      shingles → groupby(shingle % P)   → per-partition pair emission
      pairs    → groupby(pair-hash % P) → per-partition pair counting

    Two int-keyed shuffles, 2·P UDF calls total, all inner loops numpy.
    """
    # The inverted index is consumed twice (sizes + pairs): materialize it
    # once — (int64, int64) pairs, object-store-resident, spillable.
    shingled = (
        dup_corpus(sf_dir)
        .map_batches(
            lambda b: _shingle_batch(b, k),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )

    sizes_ds = shingled.groupby("doc_id").count()
    sizes = {
        r["doc_id"]: r["count()"] for r in sizes_ds.take_all()
    }  # small side: one int per doc — broadcast below

    P = _JACCARD_PARTITIONS

    def add_shingle_pk(batch: pa.Table) -> pa.Table:
        sh = batch.column("shingle").to_numpy(zero_copy_only=False)
        return batch.append_column("pk", pa.array(sh % P, pa.int32()))

    def partition_pairs(group: pa.Table) -> pa.Table:
        """Emit candidate pairs for every shingle in this hash partition —
        sort by shingle, then np.triu_indices per run."""
        sh = group.column("shingle").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh, ids = sh[order], ids[order]
        bounds = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1], True])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = e - s
            if g < 2 or (max_df is not None and g > max_df):
                continue
            ii, jj = np.triu_indices(g, 1)
            out_a.append(ids[s + ii])
            out_b.append(ids[s + jj])
        if not out_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    pairs = (
        shingled.map_batches(
            add_shingle_pk, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("pk")
        .map_groups(partition_pairs, batch_format="pyarrow")
    )

    def add_pair_pk(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pk", pa.array((a * 1_000_003 + b) % P, pa.int32())
        )

    def count_and_filter(group: pa.Table) -> pa.Table:
        t = pa.table(
            {"id_a": group.column("id_a"), "id_b": group.column("id_b")}
        )
        counted = t.group_by(["id_a", "id_b"]).aggregate([("id_a", "count")])
        a = counted.column("id_a").to_numpy(zero_copy_only=False)
        b = counted.column("id_b").to_numpy(zero_copy_only=False)
        c = counted.column("id_a_count").to_numpy(zero_copy_only=False)
        na = np.array([sizes[x] for x in a], dtype=np.int64)
        nb = np.array([sizes[x] for x in b], dtype=np.int64)
        union = na + nb - c
        keep = (union > 0) & (c / np.maximum(union, 1) >= threshold)
        return pa.table(
            {"id_a": pa.array(a[keep], pa.int64()), "id_b": pa.array(b[keep], pa.int64())}
        )

    return (
        pairs.map_batches(add_pair_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .map_groups(count_and_filter, batch_format="pyarrow")
    )


NGRAM_JACCARD_SQL = f"""
WITH corpus AS ({DUP_CORPUS_SQL}),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
  FROM toks, UNNEST(range(1, len(ts) - 1)) AS r(i)
  WHERE len(ts) >= 3
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
"""


# -- MinHash + LSH -----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Stateful stage: the permutation coefficients are built once per
    actor (seeded, deterministic)."""

    # Universal-hash modulus: Mersenne prime 2^31-1.  a*x stays < 2^62
    # (exact in uint64) and a*x+b genuinely wraps p, so each (a, b) is an
    # independent pseudo-permutation.  (With a modulus larger than a*x+b
    # the map is monotone and every "permutation" picks the same minimum —
    # the estimator degenerates to 0/1.)
    _P31 = np.uint64((1 << 31) - 1)

    def __init__(self, num_hashes: int = 64, k: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        p = int(self._P31)
        self.a = rng.randint(1, p, size=num_hashes).astype(np.uint64)
        self.b = rng.randint(0, p, size=num_hashes).astype(np.uint64)
        self.num_hashes = num_hashes
        self.k = k

    def signature(self, text: str) -> np.ndarray | None:
        toks = _TOKEN_RE.findall(text.lower())
        if len(toks) < self.k:
            return None
        # Shingle hashes as a polynomial over token CRCs (uint64 wraparound)
        # — no per-shingle string building or digest calls; distinct-set
        # semantics via np.unique; truncated to 32 bits so a*x+b stays
        # exact in uint64.
        c = np.fromiter(
            (zlib.crc32(t.encode()) for t in toks), dtype=np.uint64, count=len(toks)
        )
        n_sh = len(c) - self.k + 1
        mult = np.uint64(1_000_003)
        sh = c[:n_sh].copy()
        for j in range(1, self.k):
            sh = sh * mult + c[j : n_sh + j]
        base = np.unique((sh ^ (sh >> np.uint64(33))) % self._P31)
        # (a*x + b) mod p, min over shingles — fully vectorized.
        vals = (self.a[:, None] * base[None, :] + self.b[:, None]) % self._P31
        return vals.min(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids: list[int] = []
        sigs: list[list[int]] = []
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sig = self.signature(t)
            if sig is None:
                continue
            ids.append(doc_id)
            sigs.append([int(x) for x in sig])
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sig": pa.array(sigs, pa.list_(pa.int64())),
            }
        )


def minhash_lsh_pairs(
    sf_dir: str,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.8,
) -> "ray.data.Dataset":
    """Candidate pairs via LSH banding, verified by MinHash-estimated
    Jaccard >= threshold.

    Shuffle discipline: the band shuffle moves only (band-bucket hash,
    doc_id) int pairs — signatures are broadcast once via ``ray.put`` and
    read inside the verify tasks (at cluster scale with a signature table
    too big to broadcast, replace the broadcast with a hash join on
    doc_id; the shuffle keys stay the same).  Both wide steps are
    partition-vectorized (bounded group counts, numpy inner loops), like
    ngram_jaccard_pairs."""
    rows_per_band = num_hashes // bands
    sigs_ds = dup_corpus(sf_dir).map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_hashes": num_hashes, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool(),
    ).materialize()

    sig_rows = sigs_ds.take_all()
    sig_map = {r["doc_id"]: np.asarray(r["sig"], dtype=np.int64) for r in sig_rows}
    sig_ref = ray.put(sig_map)
    del sig_rows

    P = _JACCARD_PARTITIONS

    def band_keys(batch: pa.Table) -> pa.Table:
        ids_in = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sigs = batch.column("sig").to_pylist()
        if len(ids_in) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    "pk": pa.array([], pa.int32()),
                }
            )
        mat = np.asarray(sigs, dtype=np.uint64)  # (n, num_hashes)
        n = mat.shape[0]
        buckets = np.empty((n, bands), dtype=np.uint64)
        mult = np.uint64(1_000_003)
        for band in range(bands):
            chunk = mat[:, band * rows_per_band : (band + 1) * rows_per_band]
            h = np.full(n, np.uint64(band + 1))
            for col in range(chunk.shape[1]):
                h = h * mult + chunk[:, col]
            buckets[:, band] = h
        out_ids = np.repeat(ids_in, bands)
        out_buckets = (buckets.reshape(-1) >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "bucket": pa.array(out_buckets, pa.int64()),
                "pk": pa.array((out_buckets % P).astype(np.int32), pa.int32()),
            }
        )

    banded = sigs_ds.map_batches(
        band_keys, batch_format="pyarrow", zero_copy_batch=True
    )

    def partition_pairs(group: pa.Table) -> pa.Table:
        bk = group.column("bucket").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        bounds = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1], True])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = e - s
            if g < 2:
                continue
            ii, jj = np.triu_indices(g, 1)
            out_a.append(ids[s + ii])
            out_b.append(ids[s + jj])
        if not out_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        keep = a != b
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(b[keep], pa.int64()),
            }
        )

    pairs = banded.groupby("pk").map_groups(partition_pairs, batch_format="pyarrow")

    def add_pair_pk(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pk", pa.array((a * 1_000_003 + b) % P, pa.int32())
        )

    def verify(group: pa.Table) -> pa.Table:
        sigs = ray.get(sig_ref)
        a = group.column("id_a").to_numpy(zero_copy_only=False)
        b = group.column("id_b").to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        out_a: list[int] = []
        out_b: list[int] = []
        est: list[float] = []
        for ia, ib in uniq:
            sim = float(np.mean(sigs[ia] == sigs[ib]))
            if sim >= threshold:
                out_a.append(int(ia))
                out_b.append(int(ib))
                est.append(sim)
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )

    return (
        pairs.map_batches(add_pair_pk, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pk")
        .map_groups(verify, batch_format="pyarrow")
    )


# -- SimHash ----------------------------------------------------------------


class SimHasher:
    def __init__(self, bits: int = 64):
        self.bits = bits

    def simhash(self, text: str) -> int:
        toks = _TOKEN_RE.findall(text.lower())
        if not toks:
            return 0
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
                )
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        shifts = np.arange(self.bits, dtype=np.uint64)
        bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        acc = (bits * 2 - 1).sum(axis=0)
        out = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        return out & 0x7FFFFFFFFFFFFFFF  # low 63 bits → int64-safe

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [self.simhash(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(hashes, pa.int64()),
            }
        )


def simhash_signatures(sf_dir: str) -> "ray.data.Dataset":
    return dup_corpus(sf_dir).map_batches(
        SimHasher,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=default_pool(),
    )


# -- incremental dedup (new ingest vs a prior corpus) ------------------------


class TextBloom:
    """Broadcast Bloom filter over text hashes: the prior corpus's
    membership sketch rides in the object store (one ray.put), new ingest
    batches test against it locally — no join against the prior corpus.
    False positives are possible (tunable via n_bits); false negatives are
    not, so "new" verdicts are definitive and "maybe_dup" rows go to an
    exact confirmation stage if required."""

    def __init__(self, n_bits: int = 1 << 24, n_hashes: int = 4):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 64 + 1, dtype=np.uint64)

    @staticmethod
    def _hash64(texts: list[str]) -> np.ndarray:
        return np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
                )
                for t in texts
            ),
            dtype=np.uint64,
            count=len(texts),
        )

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # double hashing: pos_i = h1 + i*h2 mod n_bits
        h1 = h % np.uint64(self.n_bits)
        h2 = (h >> np.uint64(33)) | np.uint64(1)
        idx = np.arange(self.n_hashes, dtype=np.uint64)
        return (h1[:, None] + idx[None, :] * h2[:, None]) % np.uint64(self.n_bits)

    def add_texts(self, texts: list[str]) -> None:
        if not texts:
            return
        pos = self._positions(self._hash64(texts)).reshape(-1)
        np.bitwise_or.at(
            self.bits, pos // 64, np.uint64(1) << (pos % np.uint64(64))
        )

    def contains_texts(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros(0, dtype=bool)
        pos = self._positions(self._hash64(texts))
        got = (self.bits[pos // 64] >> (pos % np.uint64(64))) & np.uint64(1)
        return got.all(axis=1)


def build_text_bloom(ds: "ray.data.Dataset", n_bits: int = 1 << 24) -> TextBloom:
    """Aggregate a Bloom sketch over a corpus: per-batch partial sketches
    OR-merged on the driver (a sketch is ~2 MB — the merge is trivial; at
    extreme scale use a tree reduce over partial sketches)."""
    bloom = TextBloom(n_bits=n_bits)

    def sketch(batch: pa.Table) -> pa.Table:
        b = TextBloom(n_bits=n_bits)
        b.add_texts(batch.column("text").to_pylist())
        packed = b.bits.tobytes()
        return pa.table({"sketch": pa.array([packed], pa.binary())})

    for row in (
        ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    ):
        bloom.bits |= np.frombuffer(row["sketch"], dtype=np.uint64)
    return bloom


def incremental_dedup(
    new_ds: "ray.data.Dataset", bloom: TextBloom
) -> "ray.data.Dataset":
    """Classify a new ingest against a prior corpus sketch:
    status = 'new' (definitely unseen) | 'maybe_dup' (Bloom hit)."""
    bloom_ref = ray.put(bloom)

    def classify(batch: pa.Table) -> pa.Table:
        bl = ray.get(bloom_ref)
        texts = batch.column("text").to_pylist()
        hits = bl.contains_texts(texts)
        status = pa.array(
            ["maybe_dup" if h else "new" for h in hits], pa.string()
        )
        return pa.table({"doc_id": batch.column("doc_id"), "status": status})

    return new_ds.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    )
