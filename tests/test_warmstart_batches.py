"""Host-side contracts of the warm-start batch builders
(benchmarks/warmstart6q.py): row 0 of the warm batch is the EXACT
embedding, noise respects the cp/rotation split, and the ablation scan
zeroes exactly the advertised CP angles."""

import numpy as np

from benchmarks.warmstart6q import build_ablate_batch, build_warm_batch


def test_warm_batch_row0_exact_and_arms():
    P = 50
    angles = np.linspace(0, 2, P).astype(np.float32)
    cp_mask = np.zeros(P)
    cp_mask[7::10] = 1.0
    out, sig = build_warm_batch(angles, cp_mask, batch=16, seed=0)
    assert out.shape == (16, P)
    np.testing.assert_array_equal(out[0], angles)
    assert sig[0] == 0.0
    n_warm = (3 * 16) // 4
    assert (sig[:n_warm] >= 0).all() and (sig[n_warm:] == -1).all()
    # noisy warm rows stay near the source at small sigma
    i_small = 1  # sigma ladder starts at 0.003
    assert sig[i_small] == 0.003
    assert np.abs(out[i_small] - angles).max() < 0.02


def test_ablate_batch_zeroes_advertised_blocks():
    P = 40
    angles = np.full(P, 1.5, dtype=np.float32)
    cp_idx = list(range(3, P, 7))  # 6 blocks
    k = len(cp_idx)
    out, drops = build_ablate_batch(angles, cp_idx, batch=12, seed=0,
                                    sigma=0.0)
    for j in range(k):
        assert drops[j] == [j]
        assert out[j, cp_idx[j]] == 0.0
        others = [cp_idx[d] for d in range(k) if d != j]
        assert (out[j, others] == 1.5).all()
    for j in range(k, 12):
        assert len(drops[j]) == 2 and drops[j][0] != drops[j][1]
        assert all(out[j, cp_idx[d]] == 0.0 for d in drops[j])
