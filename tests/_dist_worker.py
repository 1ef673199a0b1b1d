"""Worker process for tests/test_distributed.py.

Runs the fused multi-start sweep on the restart mesh, either as one process
of a 2-process jax.distributed job (4 virtual CPU devices each, 8 global)
or standalone with 8 local devices, and prints the per-restart [initial,
best] regularized losses. The test asserts the two modes agree: restart
sharding is semantics-free whether the shards live in one process or many
(SURVEY.md §5 distributed-backend parity).

Usage: python _dist_worker.py <port> <process_id|single>
"""

import os
import sys

PORT = sys.argv[1]
WHO = sys.argv[2]

n_local = 8 if WHO == 'single' else 4
os.environ['XLA_FLAGS'] = (
    f'--xla_force_host_platform_device_count={n_local}')
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cpflow_tpu.parallel import mesh as mesh_lib  # noqa: E402

if WHO != 'single':
    mesh_lib.distributed_init(f'127.0.0.1:{PORT}', num_processes=2,
                              process_id=int(WHO))
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402

from cpflow_tpu.api import LossSpec  # noqa: E402
from cpflow_tpu.ops.gates import u_toff3  # noqa: E402
from cpflow_tpu.optimize import engine  # noqa: E402
from cpflow_tpu.sim import batched as bt  # noqa: E402
from cpflow_tpu.sim.ansatz_kernel import (cp_angle_indices,  # noqa: E402
                                          num_block_angles)
from cpflow_tpu.topology import chain_layer, fill_layers  # noqa: E402


def main():
    num_qubits, k, rot = 3, 4, 'xyz'
    placements = fill_layers(chain_layer(num_qubits), k)
    nba = num_block_angles('cp', rot)
    num_angles = 3 * num_qubits + nba * k
    cp_mask = np.zeros(num_angles, dtype=np.float32)
    cp_mask[cp_angle_indices(num_qubits, nba, k)] = 1.0

    spec = LossSpec('hst', target=u_toff3)
    regloss_fn = bt.make_batched_regloss(
        num_qubits, 'cp', rot, placements, spec, cp_mask=cp_mask,
        r=0.001, reversible=True)

    inits = np.random.default_rng(7).uniform(
        0, 2 * np.pi, (8, num_angles)).astype(np.float32)

    mesh = mesh_lib.restart_mesh()
    res = engine.minimize_fused(regloss_fn, inits, num_iterations=40,
                                keep_history=False,
                                sharding=mesh_lib.restart_sharding(mesh))

    from jax.experimental import multihost_utils
    regloss = np.asarray(
        multihost_utils.process_allgather(res.regloss, tiled=True)
        if WHO != 'single' else res.regloss)
    print('REGLOSS ' + ','.join(f'{v:.8e}' for v in regloss.reshape(-1)),
          flush=True)


if __name__ == '__main__':
    main()
