"""Cross-round TPE-trial persistence (benchmarks/trials_store.py).

The gitignored dill pickles under benchmarks/results/ are the reference's
persistence contract (main.py:459-469); the committed JSON summaries must
round-trip everything the adaptive loop reads back from them — the vals
stream, per-trial losses, and the random_seed chain api.adaptive resumes
from (api.py, 'Existing trials found on disk')."""

import json
import os

import pytest

from benchmarks import trials_store
from cpflow_tpu.search import tpe


def _toy_trials(n=7):
    trials = tpe.Trials()
    for i in range(n):
        trials.record([20 + i, 0.001 * (i + 1)],
                      {'loss': -1.0 - 0.1 * i, 'status': 'ok',
                       'num_cp_gates': 20 + i, 'r': 0.001 * (i + 1),
                       'random_seed': 1000 + i, 'cz_counts': [20 + i, 22]})
    return trials


class _FakeResults:
    def __init__(self, trials):
        self.trials = trials


def test_summary_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(trials_store, 'SUMMARY_DIR', str(tmp_path))
    trials = _toy_trials()
    path = trials_store.export_summary(_FakeResults(trials), 'toy')
    assert path and os.path.exists(path)

    loaded = trials_store.load_summary_trials('toy')
    assert loaded.vals == trials.vals
    assert [r['loss'] for r in loaded.results] == \
        [r['loss'] for r in trials.results]
    # the seed chain api.adaptive resumes from
    assert loaded.results[-1]['random_seed'] == \
        trials.results[-1]['random_seed']
    # prospective_decompositions (non-serializable) must never leak in
    raw = json.load(open(path))
    assert all('prospective_decompositions' not in row
               for row in raw['trials'])


def test_summary_skips_empty(tmp_path, monkeypatch):
    monkeypatch.setattr(trials_store, 'SUMMARY_DIR', str(tmp_path))
    assert trials_store.export_summary(_FakeResults(None), 'empty') is None
    assert trials_store.export_summary(_FakeResults(tpe.Trials()),
                                       'empty') is None
    assert trials_store.load_summary_trials('missing') is None


def test_seed_results_file(tmp_path, monkeypatch):
    monkeypatch.setattr(trials_store, 'SUMMARY_DIR', str(tmp_path))
    trials_store.export_summary(_FakeResults(_toy_trials()), 'seedme')

    from cpflow_tpu.api import Results
    save_to = str(tmp_path / 'results' / 'seedme')
    assert trials_store.seed_results_file(save_to, 'seedme',
                                          None, [[0, 1]])
    # the dill now exists and api-resume sees the full trial stream
    results = Results.load(save_to)
    assert len(results.trials.results) == 7
    assert results.trials.results[-1]['random_seed'] == 1006
    assert results.decompositions == ()

    # an existing dill is never overwritten
    assert not trials_store.seed_results_file(save_to, 'seedme',
                                              None, [[0, 1]])


def test_tpe_resumes_from_summary_trials(tmp_path, monkeypatch):
    """TPE suggestions drawn from summary-loaded trials match those drawn
    from the originals — the posterior survives the round trip."""
    import numpy as np
    monkeypatch.setattr(trials_store, 'SUMMARY_DIR', str(tmp_path))
    trials = _toy_trials(n=25)
    trials_store.export_summary(_FakeResults(trials), 'post')
    loaded = trials_store.load_summary_trials('post')

    space = [tpe.QUniformInt('num_cp_gates', 10, 50, 1),
             tpe.LogNormal('r', -5.0, 1.0)]
    a = tpe.suggest(space, trials, np.random.default_rng(7))
    b = tpe.suggest(space, loaded, np.random.default_rng(7))
    assert list(a) == list(b)
