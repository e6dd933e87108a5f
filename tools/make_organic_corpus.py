"""Generate ORGANIC (fresh-entropy) documents/embeddings at sf1 and sf10.

VERDICT r6 item 1: `make_sf1.py` scales by replication, which gives every
base document ~REPLICAS near-identical copies — the true near-duplicate
pair count inflates ~110x instead of ~10x, so the pair-bound dedup/ANN
plans' sf10 ratios could only be excused as "sublinear in planted pairs",
an unfalsifiable artifact disclaimer. This generator removes the
artifact: every document and embedding is drawn FRESH from the same
generative family as the driver's testdata (measured on
/root/testdata/sf0.1, seed 42):

- documents: tokens i.i.d. uniform over the same 31-word vocabulary,
  token count uniform in [10, 100], `lang` ~ {en: 40%, zh/fr/es/de: 15%},
  `source` = src{doc_id % 20}, `n_chars` = len(text);
- embeddings: 64-dim isotropic unit vectors (normalized Gaussian),
  `label` ~ uniform{0..9}, vec_id contiguous from 0.

With i.i.d. draws the NATURAL near-duplicate rate is ~zero at every
operator's threshold (two random 54-token docs from a 31-word vocab
share essentially no 3-shingles; P(cosine > 0.9) for random 64-dim unit
vectors is ~1e-22 per pair), so the only true pairs are the ones
`with_near_duplicates` / the eps-perturbation plant — which is LINEAR in
row count by construction. A 10x corpus therefore carries ~10x true
pairs: the pair-bound plans' scale ratios are measured against natural
duplicate density, with nothing to excuse.

Different seed (777) from the driver's (42): the corpora share no bytes.

Outputs (documents.parquet + embeddings.parquet only — the dedup/ANN
family reads nothing else):
    _artifacts/organic_sf1/   50,000 docs / 20,000 embeddings
    _artifacts/organic_sf10/ 500,000 docs / 200,000 embeddings
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = 777

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
])
LANGS = np.array(["en", "zh", "fr", "es", "de"])
LANG_P = np.array([0.40, 0.15, 0.15, 0.15, 0.15])
MIN_TOKENS, MAX_TOKENS = 10, 100
N_SOURCES = 20
EMB_DIM = 64
N_LABELS = 10


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(MIN_TOKENS, MAX_TOKENS + 1, size=n)
    toks = VOCAB[rng.integers(0, len(VOCAB), size=int(lens.sum()))]
    bounds = np.cumsum(lens)[:-1]
    texts = [" ".join(d) for d in np.split(toks, bounds)]
    doc_id = np.arange(n, dtype=np.int64)
    return pa.table({
        "doc_id": pa.array(doc_id, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(LANGS, size=n, p=LANG_P), pa.string()),
        "source": pa.array([f"src{i % N_SOURCES}" for i in range(n)],
                           pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    v = rng.standard_normal((n, EMB_DIM)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, N_LABELS, size=n).astype(np.int32),
                          pa.int32()),
    })


def main() -> None:
    for tag, n_docs, n_emb in (("organic_sf1", 50_000, 20_000),
                               ("organic_sf10", 500_000, 200_000)):
        dst = os.path.join(REPO, "_artifacts", tag)
        os.makedirs(dst, exist_ok=True)
        # independent per-dir streams: sf1 is NOT a prefix of sf10, so
        # neither corpus embeds the other (no accidental replication)
        rng = np.random.default_rng([SEED, n_docs])
        # Small row groups: Spark assigns parquet splits by row-group
        # position, so a single 500k-row group would pin the whole scan
        # (and every pre-shuffle stage above it) to ONE task — the first
        # sweep run measured exact dedup 3.7x slower purely from that.
        # 2048 rows/group gives BOTH scales ≥ 24 splits, so the sf1 leg
        # saturates local[32] like the sf10 leg does and the ratio
        # compares saturated plans (8192 left sf1 at 7 tasks, deflating
        # every scan-bound ratio by the idle-core factor).
        docs = gen_documents(n_docs, rng)
        pq.write_table(docs, os.path.join(dst, "documents.parquet"),
                       row_group_size=2048)
        emb = gen_embeddings(n_emb, rng)
        pq.write_table(emb, os.path.join(dst, "embeddings.parquet"),
                       row_group_size=2048)
        print(f"{tag}: {docs.num_rows} docs, {emb.num_rows} embeddings")


if __name__ == "__main__":
    main()
