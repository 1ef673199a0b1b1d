"""Every committed artifact must carry a recorded proof attempt
(benchmarks/proof_ledger.py): a machine-checked proof, a characterized
obstruction, or a documented search outcome. Pins VERDICT r3 weak-item 7
("nothing pins 'every claimed beat row has a proof attempt recorded'") —
landing a new artifact without updating the registry fails here."""

import pytest

ALLOWED = {'proven_cyclotomic', 'proven_ring',
           'proven_ring_superseded_stream', 'characterized', 'dfs_stalled',
           'unidentified', 'blocked_on_subblock', 'pending'}


@pytest.fixture(scope='module')
def ledger():
    from benchmarks.proof_ledger import consolidate
    return consolidate()


def test_every_artifact_has_a_recorded_attempt(ledger):
    missing = [l for l, v in ledger.items() if v['status'] == 'MISSING']
    assert not missing, f'artifacts without a proof-attempt record: {missing}'
    bad = [l for l, v in ledger.items() if v['status'] not in ALLOWED]
    assert not bad, bad


def test_proof_stream_matches_artifact_cz(ledger):
    """A 'proven'/'attempted' record must refer to the CURRENT artifact's
    stream; superseded streams must be explicitly marked (the r3
    artifact-vs-certificate drift). 'pending' rows are the explicit queue
    of new rows awaiting their first attempt."""
    drift = [l for l, v in ledger.items()
             if not v['cz_matches']
             and v['status'] not in ('proven_ring_superseded_stream',
                                     'pending')]
    assert not drift, f'proof record lags artifact without being marked: ' \
                      f'{[(l, ledger[l]["stream_cz"], ledger[l]["artifact_cz"]) for l in drift]}'


def test_cyclotomic_claims_agree_with_ledger(ledger):
    for label, v in ledger.items():
        assert v['in_cyclotomic_ledger'], \
            f'{label} missing from exact_proofs.json'
        if v['status'] == 'proven_cyclotomic':
            assert v['cyclotomic_proven'], \
                f'{label} claimed proven_cyclotomic but exact_proofs.json ' \
                f'disagrees'


def test_proven_rows_have_exact_artifacts():
    """Cyclotomic proofs commit fully symbolic artifacts; ring proofs
    commit certificates or are re-proven by the suite's proof tests."""
    import glob
    import os
    from benchmarks.proof_ledger import _ART, PROOF_STATUS
    exact = {os.path.basename(p)[:-5]
             for p in glob.glob(os.path.join(_ART, 'exact', '*.json'))}
    for label, (status, pointer, _) in PROOF_STATUS.items():
        if status == 'proven_cyclotomic':
            assert label in exact, f'{label}: no symbolic artifact'
