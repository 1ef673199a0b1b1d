"""Multi-process restart sharding: 2 jax.distributed processes (4 virtual
CPU devices each) must produce the SAME fused-sweep results as one process
with 8 devices. Exercises parallel.mesh.distributed_init for real — the
reference has no distributed backend at all (SURVEY.md §2/§5), so the
contract under test is ours: restart sharding is semantics-free across
process boundaries, with only (B,)-sized summaries gathered.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       '_dist_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the worker pins its own platform/device count; drop anything conftest
    # or the ambient tunnel may have set
    for var in ('XLA_FLAGS', 'JAX_PLATFORMS', 'JAX_PLATFORM_NAME'):
        env.pop(var, None)
    return env


def _parse_regloss(output: str) -> np.ndarray:
    for line in output.splitlines():
        if line.startswith('REGLOSS '):
            return np.array([float(v) for v in line[8:].split(',')])
    raise AssertionError(f'no REGLOSS line in worker output:\n{output}')


@pytest.mark.slow
def test_two_process_matches_single_process():
    port = _free_port()
    env = _clean_env()
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), \
        f'worker failed:\n{outs[0]}\n---\n{outs[1]}'

    single = subprocess.run(
        [sys.executable, _WORKER, str(port), 'single'],
        capture_output=True, text=True, timeout=540, env=env)
    assert single.returncode == 0, single.stdout + single.stderr

    expected = _parse_regloss(single.stdout)
    for out in outs:
        got = _parse_regloss(out)
        np.testing.assert_allclose(got, expected, rtol=0, atol=1e-6)
    # sanity: the sweep actually optimized ([initial, best] stacking)
    pairs = expected.reshape(8, 2)
    assert (pairs[:, 1] <= pairs[:, 0]).all()


@pytest.mark.slow
def test_static_pipeline_mesh_equality():
    """SURVEY §4 tier (c): same-seed Synthesize.static on one device and on
    the 8-device mesh yields identical decomposition sets (CZ counts equal,
    losses within 1e-6). num_samples is a multiple of the mesh size so
    padded_batch_size (parallel/mesh.py) changes nothing — the batches are
    bit-identical and only the sharding differs."""
    from cpflow_tpu import StaticOptions, Synthesize
    from cpflow_tpu.ops import gates
    from cpflow_tpu.parallel import mesh as mesh_lib

    opts = StaticOptions(num_cp_gates=2, accepted_num_cz_gates=3,
                         num_samples=16, num_gd_iterations=400,
                         rotation_gates='xz', random_seed=7,
                         num_gd_iterations_at_verification=1500)
    runs = {}
    for name, mesh in (('single', None), ('mesh8', mesh_lib.restart_mesh())):
        s = Synthesize([[0, 1]], target_unitary=gates.cz_mat,
                       label=f'eq_{name}', mesh=mesh)
        res = s.static(opts, save_results=False, verbose=False)
        runs[name] = sorted((d.cz_count, float(d.loss))
                            for d in res.decompositions)

    assert len(runs['single']) > 0
    assert [c for c, _ in runs['single']] == [c for c, _ in runs['mesh8']]
    for (_, l1), (_, l2) in zip(runs['single'], runs['mesh8']):
        assert abs(l1 - l2) <= 1e-6


@pytest.mark.slow
def test_adaptive_pipeline_mesh_equality():
    """Same-seed 3-eval adaptive searches agree across mesh configurations
    (decomposition CZ sets identical; losses within 1e-6)."""
    from cpflow_tpu import AdaptiveOptions, Synthesize
    from cpflow_tpu.ops import gates
    from cpflow_tpu.parallel import mesh as mesh_lib

    opts = AdaptiveOptions(min_num_cp_gates=1, max_num_cp_gates=3,
                           num_samples=16, num_gd_iterations=300,
                           rotation_gates='xz', random_seed=5, max_evals=3,
                           num_gd_iterations_at_verification=1200)
    runs = {}
    for name, mesh in (('single', None), ('mesh8', mesh_lib.restart_mesh())):
        s = Synthesize([[0, 1]], target_unitary=gates.cz_mat,
                       label=f'eqa_{name}', mesh=mesh)
        res = s.adaptive(opts, save_results=False, verbose=False)
        runs[name] = sorted((d.cz_count, float(d.loss))
                            for d in res.decompositions)

    assert [c for c, _ in runs['single']] == [c for c, _ in runs['mesh8']]
    for (_, l1), (_, l2) in zip(runs['single'], runs['mesh8']):
        assert abs(l1 - l2) <= 1e-6
