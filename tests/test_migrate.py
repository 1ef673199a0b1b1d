"""Reference-pickle migration (cpflow_tpu/migrate.py): the paper's stored
experiments (dill pickles of reference classes + hyperopt Trials + qiskit
circuits, reference main.py:459-469) load without dill/hyperopt/qiskit and
compare directly against this implementation."""

import os

import pytest

_RESULTS_DIR = '/root/reference/paper/results'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_RESULTS_DIR),
    reason='reference paper results not available')


def test_load_toff3_chain_trials_and_decompositions():
    from cpflow_tpu.api import Results
    from cpflow_tpu.migrate import (load_reference_pickle,
                                    migrated_decompositions, trial_records)

    r = load_reference_pickle(os.path.join(_RESULTS_DIR, 'toff3_chain_xyz'))
    # the compat shim maps cpflow.main.Results to OUR class
    assert isinstance(r, Results)

    tr = trial_records(r)
    assert len(tr) == 100
    t0 = tr[0]
    assert t0['num_cp_gates'] > 0 and t0['r'] > 0
    assert len(t0['cz_counts']) > 0

    decs = migrated_decompositions(r)
    assert len(decs) == 92
    # every stored circuit rebuilds in our IR with the same CZ count and
    # reproduces the reference's own stored unitary
    for d in decs:
        assert d['cz_count'] == d['stored_cz_count']
        assert d['hs_distance_to_stored'] < 1e-5
    # the paper's 8-CZ chain Toffoli is among them
    assert min(d['cz_count'] for d in decs) == 8


def test_load_5q_benchmark_results():
    from cpflow_tpu.migrate import (load_reference_pickle,
                                    migrated_decompositions, trial_records)

    r = load_reference_pickle(os.path.join(_RESULTS_DIR, 'res_4gt5_76'))
    tr = trial_records(r)
    assert len(tr) > 0
    decs = migrated_decompositions(r)
    assert len(decs) > 0
    for d in decs:
        assert d['cz_count'] == d['stored_cz_count']
        assert d['hs_distance_to_stored'] < 1e-5
