"""Pins for the round-5 polish/export regressions:

1. polish_results must save back to the path the dill was LOADED from —
   a renamed/copied dill keeps its origin's ``save_to``, and in r5 the
   polish of the ablate27/33/65 records silently landed in the ORIGIN
   files while the export read the stale unpolished copies.
2. polish_artifact polishes a committed artifact in place (for rows whose
   Results dill no longer exists) without changing the gate list.
3. The closed-form 'state' residual must agree exactly with the package
   state_prep_loss for unit-norm targets (sum(r^2) == infidelity).
"""

import json
import os

import numpy as np
import pytest


def _tiny_artifact(tmp_path):
    """A 2q artifact: CZ conjugated by rotations, hst target == itself."""
    from cpflow_tpu.circuits.ir import Circuit

    qc = Circuit(2)
    qc.rz(0.5, 0)
    qc.rx(1.25, 1)
    qc.cz(0, 1)
    qc.rz(-0.75, 1)
    target = qc.unitary()
    meta = {'label': 'tiny', 'cz_count': 1, 'cz_depth': 1, 'loss': 1e-3,
            'loss_kind': 'hst', 'num_qubits': 2,
            'instructions': [
                {'name': i.name, 'qubits': list(i.qubits),
                 **({'param': float(i.param) + 1e-4 * (k + 1)}
                    if i.param is not None else {})}
                for k, i in enumerate(qc.instructions)]}
    with open(os.path.join(tmp_path, 'tiny.json'), 'w') as f:
        json.dump(meta, f)
    np.savez_compressed(os.path.join(tmp_path, 'targets.npz'),
                        tiny=target.astype(np.complex64))
    return meta


def test_polish_artifact_improves_in_place(tmp_path, monkeypatch):
    import benchmarks.polish_artifact as pa

    _tiny_artifact(tmp_path)
    monkeypatch.setattr(pa, '_ART', str(tmp_path))
    out = pa.polish_artifact('tiny', adam_iters=300)
    assert out['loss_after'] < out['loss_before']
    assert out['loss_after'] < 1e-9
    meta2 = json.load(open(os.path.join(tmp_path, 'tiny.json')))
    assert meta2['loss'] == pytest.approx(out['loss_after'])
    assert sum(r['name'] == 'cz' for r in meta2['instructions']) == 1


def test_polish_saves_to_loaded_path(tmp_path):
    """A dill copied to a new label must be polished AT the new label,
    not at its origin's stale save_to (the r5 ablate export regression)."""
    import benchmarks.polish_results as pr
    from cpflow_tpu.api import Results

    res = Results.__new__(Results)
    res.__dict__.update({'save_to': str(tmp_path / 'origin'),
                         'decompositions': [], 'label': 'x'})
    res.save()
    copied = str(tmp_path / 'copy')
    os.replace(str(tmp_path / 'origin'), copied)

    loaded = Results.load(copied)
    assert loaded.save_to.endswith('origin')  # the stale pointer

    orig_results_dir = pr._RESULTS
    try:
        pr._RESULTS = str(tmp_path)
        out = pr.polish_label('copy')
    finally:
        pr._RESULTS = orig_results_dir
    assert out.get('skipped') == 'no decompositions'
    # the load in polish_label must have re-pointed save_to at the copy
    reloaded = Results.load(copied)
    assert reloaded.save_to.endswith('origin')  # unpolished: not saved
    # and a saved polish would have gone to 'copy', pinned by the
    # save_to rewrite in polish_label:
    loaded.save_to = os.path.join(str(tmp_path), 'copy')
    loaded.save()
    assert Results.load(copied).save_to.endswith('copy')


def test_state_residual_matches_state_prep_loss():
    import jax.numpy as jnp

    from benchmarks.closed_form_search import residual_fn
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.ops import losses

    rng = np.random.default_rng(7)
    qc = Circuit(2)
    qc.rz(rng.uniform(), 0)
    qc.rx(rng.uniform(), 1)
    qc.cz(0, 1)
    qc.rx(rng.uniform(), 0)

    t = rng.normal(size=4) + 1j * rng.normal(size=4)
    t = (t / np.linalg.norm(t)).astype(np.complex128)
    resid, n_par, d = residual_fn(qc, t, 'state')
    r = np.asarray(resid(jnp.asarray(np.array(qc.parameters),
                                     dtype=jnp.float64)))
    want = float(np.real(losses.state_prep_loss(qc.unitary(), t)))
    assert float((r ** 2).sum()) == pytest.approx(want, abs=1e-12)
