"""Device-mesh scale-out for the restart batch.

The reference is strictly single-device (SURVEY.md §2: no collectives, no
multi-process anything); its only parallel axis is the vmap over random
restarts (optimization.py:362). On TPU that axis shards naturally: we build a
1-d ``jax.sharding.Mesh`` over all chips and give the restart batch a
``NamedSharding(P('restarts'))``. XLA then partitions the whole
minimize->evaluate pipeline with zero collectives in the hot loop (each
restart is independent); only the final (B,)/(B,P) float summaries are
gathered, which is negligible traffic over ICI.

Multi-host: call ``distributed_init()`` (a thin jax.distributed wrapper)
before building the mesh; host 0 keeps the TPE loop, filtering and
persistence, exactly like the reference's single-process driver.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RESTART_AXIS = 'restarts'


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op when single-process args are absent).

    On the CPU backend cross-process collectives need an implementation;
    gloo ships with jaxlib, so select it so that multi-process runs (and the
    hermetic multi-process tests) work out of the box. The setting only
    affects the CPU client — on TPU pods the ICI/DCN path is untouched.
    """
    if coordinator_address is None:
        return
    try:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    except Exception:  # noqa: BLE001 — older/newer jaxlib without the knob
        pass
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def restart_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-d mesh over all (or the given) devices with a 'restarts' axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), axis_names=(RESTART_AXIS,))


def restart_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays whose leading axis is the restart batch."""
    return NamedSharding(mesh, P(RESTART_AXIS))


def padded_batch_size(num_samples: int, mesh: Optional[Mesh]) -> int:
    """Round the restart count up to a multiple of the mesh size (restarts
    are i.i.d., so extra samples only improve coverage)."""
    if mesh is None:
        return num_samples
    d = mesh.devices.size
    return ((num_samples + d - 1) // d) * d
