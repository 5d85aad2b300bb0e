"""Near-dup at the SCALE configuration: C = cells_for(n), multi-probe.

The registry fixture pins C=16 single-probe to match its DuckDB oracle;
this file exercises the documented scale path on a corpus with PLANTED
near-duplicates (tiny perturbations, cos ~ 0.999 — the regime IVF-cell
blocking is designed for; at loose thresholds like the fixture's 0.40 the
operator is a similarity join and recall is a knob, not a guarantee).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from torchtrajectory_spark.operators import similarity

N_BASE = 300
N_DUP = 100
D = 16
THRESH = 0.98


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(N_BASE, D))
    dup_src = base[:N_DUP]
    dups = dup_src + rng.normal(scale=1e-3, size=dup_src.shape)
    X = np.concatenate([base, dups]).astype(np.float32)
    pdf = pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": list(X),
    })
    emb = spark.createDataFrame(pdf)
    # ground truth pairs over the float32-stored vectors
    Xd = X.astype(np.float64)
    nrm = np.sqrt((Xd * Xd).sum(1))
    cos = (Xd @ Xd.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(X), 1)
    truth = {
        (int(i), int(j))
        for i, j in zip(*iu) if cos[i, j] >= THRESH
    }
    planted_pairs = {(i, N_BASE + i) for i in range(N_DUP)}
    assert planted_pairs <= truth  # the perturbation kept cos >= THRESH
    return emb, truth, planted_pairs


def test_near_dup_scale_config_recall(spark, planted):
    """At C = cells_for(n) (not the fixture's pinned 16): single-probe
    recall on planted dups is near-total but NOT guaranteed (a pair whose
    members straddle a Voronoi boundary lands in different cells — the
    documented single-probe gap; this fixture has exactly one such pair);
    multi-probe n_probe=2 closes it and must find every planted pair."""
    emb, truth, planted_pairs = planted
    n = emb.count()
    C = similarity.cells_for(n)
    assert C > 16  # actually exercises the scale sizing
    got = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_near_dup(
            emb, THRESH, n_centroids=C
        ).collect()
    }
    assert got <= truth          # no false pairs, values exact
    assert len(got & planted_pairs) >= len(planted_pairs) - 1
    got_mp = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_near_dup_multiprobe(
            emb, THRESH, n_centroids=C, n_probe=2
        ).collect()
    }
    assert planted_pairs <= got_mp  # multi-probe: full planted recall


def test_near_dup_scale_config_recall_number(spark, planted):
    """Quantified recall vs the EXACT pair set (not just planted pairs):
    multi-probe n_probe=2 at C = cells_for(n) must recover >= 0.95 of all
    true pairs at the near-dup threshold (VERDICT r3 task #7). The number
    is recorded in BASELINE.md."""
    emb, truth, _ = planted
    C = similarity.cells_for(emb.count())
    got_mp = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_near_dup_multiprobe(
            emb, THRESH, n_centroids=C, n_probe=2
        ).collect()
    }
    assert got_mp <= truth  # exact verification: precision is 1.0
    recall = len(got_mp & truth) / len(truth)
    print(f"\nscale-config near-dup recall @C={C}, probe=2: "
          f"{recall:.4f} ({len(got_mp)}/{len(truth)} pairs)")
    assert recall >= 0.95, recall


def test_near_dup_scale_config_multiprobe_superset(spark, planted):
    """Multi-probe may only ADD true pairs relative to single-probe."""
    emb, truth, _ = planted
    C = similarity.cells_for(emb.count())
    single = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_near_dup(
            emb, THRESH, n_centroids=C
        ).collect()
    }
    multi = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_near_dup_multiprobe(
            emb, THRESH, n_centroids=C, n_probe=2
        ).collect()
    }
    assert single <= multi
    assert multi <= truth
