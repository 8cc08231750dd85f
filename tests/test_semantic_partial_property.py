"""Round 11: randomized equivalence property for the doc-level partial
decomposition (`similarity.semantic_partial_verdicts`) — the de-cliff's
soundness argument, exercised over adversarial random lakes instead of
hand-picked shapes.

For each seeded case we build a PRIOR membership (unchanged docs ∪ the
changed dataset's old docs) and a CURRENT membership (unchanged docs ∪
new changed docs — removals, additions, same-id-new-vector rewrites all
allowed, because dataset-level freshness treats the whole changed
dataset as opaque), compute the prior verdicts with the full formula,
feed ONLY the unchanged datasets' prior rows to the partial
decomposition, and require its output to equal the full formula over
the current membership EXACTLY — kept flags, row set, everything.

Adversarial ingredients baked into the generator: duplicate vectors
(similarity ties), equal scores (id tiebreaks), NULL scores (-inf
coalesce), removed beaters (the revive leg), docs missing from the
prior (the self-heal leg), empty changed sets and empty priors.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pydala_spark.operators.similarity import (
    semantic_kept_against,
    semantic_partial_verdicts,
)

SEP = "\x1f"


def _mk_rows(rng, ds, ids, anchors):
    """(id, cell, vec, __n, __s) rows; vectors drawn near shared anchors
    so similarity ties and near-dup groups actually occur."""
    rows = []
    for i in ids:
        a = anchors[int(rng.integers(0, len(anchors)))]
        if rng.random() < 0.4:
            vec = a.copy()  # exact duplicate of the anchor: forced ties
        else:
            vec = a + rng.normal(scale=0.15, size=a.shape)
        if rng.random() < 0.25:
            score = None  # NULL score: -inf coalesce path
        elif rng.random() < 0.3:
            score = 0.5  # shared score: id tiebreak path
        else:
            score = float(np.round(rng.random(), 3))
        cell = int(rng.integers(0, 3))
        rows.append((f"{ds}{SEP}{i}", cell,
                     [float(x) for x in vec],
                     float(np.linalg.norm(vec)), score))
    return rows


def _base(spark, rows):
    return spark.createDataFrame(
        rows, "id string, cell int, vec array<double>, "
              "__n double, __s double")


@pytest.mark.parametrize("seed", range(8))
def test_partial_decomposition_equals_full(spark, seed):
    rng = np.random.default_rng(seed)
    anchors = rng.normal(size=(3, 4))

    n_u = int(rng.integers(0, 9))       # unchanged docs (0 = empty prior)
    n_c_old = int(rng.integers(0, 7))   # changed ds, prior night
    n_c_new = int(rng.integers(0, 7))   # changed ds, tonight
    u_rows = _mk_rows(rng, "u", range(n_u), anchors)
    c_old = _mk_rows(rng, "c", range(n_c_old), anchors)
    # tonight's changed docs OVERLAP the old ids sometimes (same id,
    # new vector — a rewrite), extend past them sometimes (appends),
    # and drop the tail (removals -> the revive leg)
    c_new = _mk_rows(rng, "c",
                     range(int(rng.integers(0, 3)),
                           int(rng.integers(0, 3)) + n_c_new), anchors)

    prior_base = _base(spark, u_rows + c_old)
    cur_base = _base(spark, u_rows + c_new)
    threshold = 0.9

    # the prior night's verdicts, restricted to the UNCHANGED datasets
    # (exactly what the sweep reads from the pruned verdict partitions)
    prior_verdicts = semantic_kept_against(
        prior_base, prior_base, threshold=threshold, scored=True,
    ).where(F.col("id").startswith("u" + SEP)).select("id", "kept")
    # ...and sometimes a prior row goes MISSING out-of-band: the
    # decomposition must self-heal that doc into the full leg
    if n_u > 0 and rng.random() < 0.5:
        prior_verdicts = prior_verdicts.where(
            F.col("id") != f"u{SEP}0")

    actual = semantic_partial_verdicts(
        cur_base, prior_verdicts,
        is_changed=F.col("id").startswith("c" + SEP),
        threshold=threshold, scored=True,
    )
    expected = semantic_kept_against(
        cur_base, cur_base, threshold=threshold, scored=True)

    a = sorted(map(tuple, actual.collect()))
    e = sorted(map(tuple, expected.collect()))
    assert a == e, (seed, n_u, n_c_old, n_c_new)
