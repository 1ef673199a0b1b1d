"""TPE hyperparameter search: convergence and record schema."""

import numpy as np
import pytest

from cpflow_tpu.search import tpe


def test_prior_sampling_ranges():
    rng = np.random.default_rng(0)
    q = tpe.QUniformInt('k', 3, 20, 1)
    ln = tpe.LogNormal('r', np.log(1e-3), 0.5)
    ks = [q.sample_prior(rng) for _ in range(200)]
    rs = [ln.sample_prior(rng) for _ in range(200)]
    assert min(ks) >= 3 and max(ks) <= 20
    assert all(isinstance(k, int) for k in ks)
    assert all(r > 0 for r in rs)
    # lognormal median ~ exp(mu)
    assert np.median(rs) == pytest.approx(1e-3, rel=0.5)


def test_parzen_logpdf_normalizes():
    p = tpe._Parzen(np.array([0.0, 1.0, 2.0]), prior_mu=1.0, prior_sigma=2.0)
    xs = np.linspace(-10, 12, 2001)
    pdf = np.exp(p.logpdf(xs))
    integral = np.trapezoid(pdf, xs)
    assert integral == pytest.approx(1.0, abs=0.02)


def test_tpe_beats_random_on_quadratic():
    """TPE should concentrate samples near the optimum of a smooth objective."""
    space = [tpe.QUniformInt('k', 0, 100, 1),
             tpe.LogNormal('r', np.log(1.0), 1.0)]

    def run(use_tpe, seed):
        rng = np.random.default_rng(seed)
        trials = tpe.Trials()
        for _ in range(60):
            if use_tpe:
                vals = tpe.suggest(space, trials, rng)
            else:
                vals = [d.sample_prior(rng) for d in space]
            k, r = vals
            loss = (k - 70) ** 2 / 100.0 + (np.log(r) - 0.5) ** 2
            trials.record(vals, {'loss': loss})
        return trials.losses().min()

    tpe_best = np.mean([run(True, s) for s in range(5)])
    rand_best = np.mean([run(False, s) for s in range(5)])
    assert tpe_best <= rand_best * 1.05  # at least as good as random


def test_fmin_and_trials_schema():
    space = [tpe.QUniformInt('k', 1, 10, 1),
             tpe.LogNormal('r', np.log(0.01), 0.5)]
    trials = tpe.Trials()

    def objective(vals):
        k, r = vals
        return {'loss': abs(k - 5) + abs(np.log(r / 0.01)),
                'num_cp_gates': k, 'r': r}

    best = tpe.fmin(objective, space, trials, max_evals=30,
                    rng=np.random.default_rng(1))
    assert len(trials) == 30
    assert len(trials.trials) == 30
    assert 'loss' in best['result']
    # incremental fmin (one more eval) continues from existing trials
    tpe.fmin(objective, space, trials, max_evals=31,
             rng=np.random.default_rng(2))
    assert len(trials) == 31


def test_suggest_handles_inf_losses():
    space = [tpe.QUniformInt('k', 1, 5, 1),
             tpe.LogNormal('r', np.log(0.01), 0.5)]
    trials = tpe.Trials()
    rng = np.random.default_rng(0)
    for i in range(25):
        vals = tpe.suggest(space, trials, rng)
        trials.record(vals, {'loss': float('inf') if i % 2 else float(i)})
    vals = tpe.suggest(space, trials, rng)
    assert 1 <= vals[0] <= 5 and vals[1] > 0
