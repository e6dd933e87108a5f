"""Generate ORGANIC (fresh-entropy) documents/embeddings at sf1/sf10/sf100.

VERDICT r6 item 1: `make_sf1.py` scales by replication, which gives every
base document ~REPLICAS near-identical copies — the true near-duplicate
pair count inflates ~110x instead of ~10x, so the pair-bound dedup/ANN
plans' sf10 ratios could only be excused as "sublinear in planted pairs",
an unfalsifiable artifact disclaimer. This generator removes the
artifact: every document and embedding is drawn FRESH, i.i.d., so the
only true near-duplicate pairs are the ones `with_near_duplicates`
plants at query time — LINEAR in row count by construction.

**Round-9 vocabulary fix.** The first organic generator reused the
driver testdata's 31-word vocabulary. That preserved the generative
family but silently broke this corpus's own premise at scale: with only
31³ ≈ 30k possible 3-shingles and ~52 shingles/doc, two RANDOM docs
share enough shingles that MinHash band collisions occur at a constant
per-pair rate — i.e. RANDOM candidate pairs grow ~n². Measured on the
31-word corpora: minhash-LSH candidates 178k @sf1 → 14.25M @sf10 (80x
for 10x docs; planted pairs are only ~333k of corpus, so ~97% of sf10
candidates were vocabulary artifacts), simhash pairs 0.45M → 42.8M
(94x). Extrapolated to the sf100 decade that is ~1.4B minhash
candidates and ~4.3B simhash pairs — the pair-bound plans' scale
ratios would price corpus degeneracy, not the plans. With a 4096-word
vocabulary the shingle space is 4096³ ≈ 6.9e10, expected shared
shingles between two random ~52-shingle docs ≈ 52²/4096³ ≈ 4e-8 →
random-pair Jaccard ≈ 0, MinHash band-collision probability ≈ 0, and
independent 64-bit SimHash signatures collide within hamming ≤ 3 w.p.
~2e-15/pair (~0.05 expected pairs at 5M docs). True pairs are then the
PLANTED ones alone at every decade — exactly the premise the docstring
above always claimed. All decades are generated with the same
vocabulary so cross-decade ratios compare like-for-like.

Corpus shape (everything except the vocabulary matches the driver's
testdata family, measured on /root/testdata/sf0.1, seed 42):

- documents: tokens i.i.d. uniform over the 4096-word vocabulary,
  token count uniform in [10, 100], `lang` ~ {en: 40%, zh/fr/es/de: 15%},
  `source` = src{doc_id % 20}, `n_chars` = len(text);
- embeddings: 64-dim isotropic unit vectors (normalized Gaussian),
  `label` ~ uniform{0..9}, vec_id contiguous from 0.

Different seed (777) from the driver's (42): the corpora share no bytes.

Outputs (documents.parquet + embeddings.parquet only — the dedup/ANN
family reads nothing else):
    _artifacts/organic_sf1/       50,000 docs /    20,000 embeddings
    _artifacts/organic_sf10/     500,000 docs /   200,000 embeddings
    _artifacts/organic_sf100/  5,000,000 docs / 2,000,000 embeddings
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = 777

# 4096 synthetic words, 4-7 chars, deterministic (letters only so every
# tokenizer in the engine — whitespace, BPE-ish regex, shingler — treats
# each as one token, same as the driver vocabulary's words).
_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def _make_vocab(n: int = 4096) -> np.ndarray:
    words, seen = [], set()
    rng = np.random.default_rng([SEED, 4096])
    while len(words) < n:
        syll = rng.integers(2, 4)  # 2-3 CV syllables -> 4-7 chars
        w = "".join(
            _CONS[rng.integers(0, len(_CONS))] + _VOW[rng.integers(0, len(_VOW))]
            for _ in range(int(syll))
        )
        if rng.integers(0, 2):
            w += _CONS[rng.integers(0, len(_CONS))]
        if w not in seen:
            seen.add(w)
            words.append(w)
    return np.array(words)


VOCAB = _make_vocab()
LANGS = np.array(["en", "zh", "fr", "es", "de"])
LANG_P = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
MIN_TOKENS, MAX_TOKENS = 10, 100
N_SOURCES = 20
EMB_DIM = 64
N_LABELS = 10

# Chunked generation + a single ParquetWriter: the sf100 decade is 5M
# docs (~270M tokens, ~1.9 GB text) — building it as one python list of
# strings would spike the generator near 20 GB RSS for no benefit.
DOC_CHUNK = 250_000
EMB_CHUNK = 250_000


def _doc_chunk(start: int, n: int, rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(MIN_TOKENS, MAX_TOKENS + 1, size=n)
    toks = VOCAB[rng.integers(0, len(VOCAB), size=int(lens.sum()))]
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(d) for d in np.split(toks, bounds)]
    doc_id = np.arange(start, start + n, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(LANGS, size=n, p=LANG_P), pa.string()),
        "source": pa.array([f"src{i % N_SOURCES}" for i in
                            range(start, start + n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def _emb_chunk(start: int, n: int, rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((n, EMB_DIM)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(start, start + n, dtype=np.int64),
                           pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, N_LABELS, size=n).astype(np.int32),
                          pa.int32()),
    })


def _write_chunked(path: str, total: int, chunk: int, make_chunk,
                   rng: np.random.Generator, row_group: int) -> None:
    writer = None
    try:
        for start in range(0, total, chunk):
            n = min(chunk, total - start)
            t = make_chunk(start, n, rng)
            if writer is None:
                writer = pq.ParquetWriter(path, t.schema)
            writer.write_table(t, row_group_size=row_group)
    finally:
        if writer is not None:
            writer.close()


SCALES: tuple[tuple[str, int, int], ...] = (
    ("organic_sf1", 50_000, 20_000),
    ("organic_sf10", 500_000, 200_000),
    ("organic_sf100", 5_000_000, 2_000_000),
)


def build_scale(tag: str, n_docs: int, n_emb: int) -> str:
    """Generate ONE organic decade (idempotent inputs — deterministic
    given (SEED, n_docs)); returns the output dir."""
    dst = os.path.join(REPO, "_artifacts", tag)
    os.makedirs(dst, exist_ok=True)
    # independent per-dir streams: no corpus embeds another as a
    # prefix (no accidental replication between decades)
    rng = np.random.default_rng([SEED, n_docs])
    # Small row groups: Spark assigns parquet splits by row-group
    # position, so oversized groups pin scans (and every pre-shuffle
    # stage above them) to too few tasks — the first sweep run
    # measured exact dedup 3.7x slower purely from that. 2048
    # rows/group gives the sf1 leg ≥ 24 splits so it saturates
    # local[32] like the bigger legs; the sf100 leg uses 8192 (610
    # groups — still ~19 splits/core — while keeping footer metadata
    # proportionate).
    rg = 8192 if n_docs >= 5_000_000 else 2048
    _write_chunked(os.path.join(dst, "documents.parquet"),
                   n_docs, DOC_CHUNK, _doc_chunk, rng, rg)
    _write_chunked(os.path.join(dst, "embeddings.parquet"),
                   n_emb, EMB_CHUNK, _emb_chunk, rng, rg)
    print(f"{tag}: {n_docs} docs, {n_emb} embeddings")
    return dst


def main() -> None:
    for tag, n_docs, n_emb in SCALES:
        build_scale(tag, n_docs, n_emb)


if __name__ == "__main__":
    main()
