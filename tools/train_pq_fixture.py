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

_FIXDIR = posixpath.join(
    posixpath.dirname(posixpath.dirname(posixpath.abspath(__file__))),
    "pydala_spark", "queries", "fixtures",
)
FIXTURE = posixpath.join(_FIXDIR, "pq_codebook_d64_m8_k16.json")
RESIDUAL_FIXTURE = posixpath.join(
    _FIXDIR, "pq_codebook_d64_m8_k16_residual.json"
)
OPQ_FIXTURE = posixpath.join(_FIXDIR, "pq_codebook_d64_m8_k16_opq.json")
IVF_FIXTURE = posixpath.join(_FIXDIR, "ivf_codebook_d64_c16.json")
OPQ_ITERATIONS = 40


def train(x: np.ndarray, m: int, n_codes: int, seed: int, iterations: int,
          normalize: bool = True):
    """Delegates to the operators' ONE shared subspace-k-means loop
    (ann._subspace_kmeans — same RNG draw sequence, tie-break and
    update rule), so the pinned fixture can never desynchronize from
    what the engine computes. Residual training passes pre-residualized
    rows with ``normalize=False`` (residuals must NOT be
    re-normalized)."""
    import sys as _sys

    _sys.path.insert(0, posixpath.dirname(posixpath.dirname(
        posixpath.abspath(__file__))))
    from pydala_spark.operators.ann import _subspace_kmeans

    assert x.shape[1] % m == 0
    if normalize:
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return _subspace_kmeans(x, m, n_codes, seed, iterations).tolist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t = pq.read_table(posixpath.join(sf_dir, "embeddings.parquet"))
    x = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()])
    books = train(x, M, N_CODES, SEED, ITERATIONS)
    with open(FIXTURE, "w") as f:
        json.dump({"m": M, "n_codes": N_CODES, "centroids": books}, f)
    print(f"wrote {FIXTURE}: m={M} n_codes={N_CODES} dsub={x.shape[1]//M}")
    # residual variant (round 5, the actual Jégou IVFADC): anchors are
    # per-cell MEANS of the unit vectors under the PINNED IVF codebook
    # (the unit centroid is a bad subtraction reference — residual norms
    # exceed 1 on this weakly-clustered corpus; the cell mean is the
    # L2-optimal anchor), and books train on x_unit − anchor[cell], so
    # the q_ann_topk ivfpq oracle and the operator share one
    # deterministic (anchors, books) set
    from pydala_spark.operators.ann import _cell_mean_anchors

    with open(IVF_FIXTURE) as f:
        cents = np.array(json.load(f)["centroids"], dtype=np.float64)
    xu = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    assign, anchors = _cell_mean_anchors(xu, cents)
    res = xu - anchors[assign]
    rbooks = train(res, M, N_CODES, SEED, ITERATIONS, normalize=False)
    with open(RESIDUAL_FIXTURE, "w") as f:
        json.dump(
            {"m": M, "n_codes": N_CODES, "residual": True,
             "anchors": anchors.tolist(), "centroids": rbooks},
            f,
        )
    print(f"wrote {RESIDUAL_FIXTURE} (cell-mean anchors + residual books)")
    # OPQ variant (round 8, Ge et al. 2013): the SAME anchors, but the
    # books quantize the ROTATED residual R·(x_unit − anchor[cell]) with
    # R learned by the shared alternating-minimization loop
    # (ann._opq_alternate) — rotation rides the fixture/sidecar exactly
    # like the anchors so the oracle and the operator share one geometry
    from pydala_spark.operators.ann import _opq_alternate

    obooks, rot = _opq_alternate(
        res, M, N_CODES, SEED, ITERATIONS, OPQ_ITERATIONS
    )
    with open(OPQ_FIXTURE, "w") as f:
        json.dump(
            {"m": M, "n_codes": N_CODES, "residual": True,
             "anchors": anchors.tolist(), "rotation": rot.tolist(),
             "centroids": obooks.tolist()},
            f,
        )
    print(f"wrote {OPQ_FIXTURE} (OPQ rotation + rotated-residual books)")


if __name__ == "__main__":
    main()
