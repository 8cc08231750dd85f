"""Train and pin the product-quantization codebook fixture.

Trains per-subspace L2 k-means codebooks on the sf0.01 embeddings table
(unit-normalized, split into ``m`` contiguous subvectors) and writes
``pydala_spark/queries/fixtures/pq_codebook_d64_m8_k16.json``. Run once;
the fixture is committed so ``q_pq_topk`` and its DuckDB oracle share one
deterministic codebook — the same train-once-reuse-everywhere contract as
the IVF fixture (see queries/ext.py q_ivf_topk).

Usage: python tools/train_pq_fixture.py [sf_dir]
"""

from __future__ import annotations

import json
import posixpath
import sys

import numpy as np
import pyarrow.parquet as pq

M = 8
N_CODES = 16
SEED = 42
ITERATIONS = 20

FIXTURE = posixpath.join(
    posixpath.dirname(posixpath.dirname(posixpath.abspath(__file__))),
    "pydala_spark", "queries", "fixtures", "pq_codebook_d64_m8_k16.json",
)


def train(x: np.ndarray, m: int, n_codes: int, seed: int, iterations: int):
    """Plain (non-spherical) per-subspace k-means — PQ encodes by
    RECONSTRUCTION error, so the codebooks minimize L2, while search
    scores by inner product against the reconstruction."""
    n, dim = x.shape
    assert dim % m == 0
    dsub = dim // m
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    books = []
    rng = np.random.default_rng(seed)
    for i in range(m):
        sub = x[:, i * dsub : (i + 1) * dsub]
        cents = sub[rng.choice(n, size=n_codes, replace=False)].copy()
        for _ in range(iterations):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents.tolist())
    return books


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t = pq.read_table(posixpath.join(sf_dir, "embeddings.parquet"))
    x = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    books = train(x, M, N_CODES, SEED, ITERATIONS)
    with open(FIXTURE, "w") as f:
        json.dump({"m": M, "n_codes": N_CODES, "centroids": books}, f)
    print(f"wrote {FIXTURE}: m={M} n_codes={N_CODES} dsub={x.shape[1]//M}")


if __name__ == "__main__":
    main()
