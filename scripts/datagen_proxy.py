"""Generate a LOCAL sf1.0-shaped proxy dataset for bench measurement.

The driver's round-end measurement escalates to its own sf1.0
(documents 50k / events 1M / embeddings 20k — inferred from the
sf0.01->sf0.1 scaling of the provided dirs). We cannot reproduce its
exact seed, but relative before/after timings only need matched
SHAPES: row counts, text length distribution, vocab size, user/event
density, embedding dim. Writes /root/localdata/sf1.0/ with the three
tables bench.py reads. Usage: python scripts/datagen_proxy.py [sf]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window join table vector stream "
    "customer data the a of to and"
).split()


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = f"/root/localdata/sf{sf:g}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    # --- documents: 50_000 * sf rows, ~50 tokens/doc from a 31-word vocab
    n_docs = int(50_000 * sf)
    lens = rng.integers(8, 100, n_docs)
    texts = []
    vocab = np.array(VOCAB)
    for n in lens:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n)]))
    # a few exact dups like the driver data (8 per 5000)
    for i in range(0, n_docs, 625):
        if i + 1 < n_docs:
            texts[i + 1] = texts[i]
    langs = rng.choice(
        np.array(["en", "zh", "es", "fr", "de"]),
        n_docs, p=[0.41, 0.15, 0.15, 0.15, 0.14],
    )
    srcs = np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n_docs)]
    tab = pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tab, f"{out}/documents.parquet")

    # --- events: 1M * sf rows over 15000 * sf users, 30 days
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    ts = np.sort(rng.integers(0, 30 * 86400 * 10**6, n_ev)) + 1704067200 * 10**6
    etypes = np.array(["click", "error", "purchase", "signup", "view"])
    tab = pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(etypes[rng.integers(0, 5, n_ev)], pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 560, n_ev), 2), pa.float64()),
        "props": pa.array(
            [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
            pa.string()),
    })
    pq.write_table(tab, f"{out}/events.parquet")

    # --- embeddings: 20_000 * sf rows, dim 64
    n_emb = int(20_000 * sf)
    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    tab = pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    })
    pq.write_table(tab, f"{out}/embeddings.parquet")
    print(f"wrote {out}: docs={n_docs} events={n_ev} emb={n_emb}")


if __name__ == "__main__":
    main()
