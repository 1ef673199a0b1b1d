"""Profiling and throughput instrumentation.

The reference has no tracing/profiling at all (SURVEY.md §5: prints + tqdm
only). This module adds the two things a TPU deployment actually needs:

  * ``trace(logdir)``: context manager around jax.profiler for TensorBoard
    traces of the jitted sweep;
  * ``Throughput``: restart-iterations/sec counter (the BASELINE.json
    headline metric), with a tunnel-safe synchronization strategy — timing
    closes over a scalar device->host readout because block_until_ready is
    not reliable over remote-device tunnels.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Throughput:
    """Accumulates (restarts x iterations, seconds) across timed sections."""
    restart_iterations: float = 0.0
    seconds: float = 0.0
    sections: List[dict] = field(default_factory=list)

    @contextlib.contextmanager
    def section(self, num_restarts: int, num_iterations: int,
                label: str = ''):
        t0 = time.time()
        yield
        dt = time.time() - t0
        work = float(num_restarts) * float(num_iterations)
        self.restart_iterations += work
        self.seconds += dt
        self.sections.append({'label': label, 'restart_iterations': work,
                              'seconds': dt,
                              'rate': work / dt if dt > 0 else float('inf')})

    @property
    def rate(self) -> float:
        return self.restart_iterations / self.seconds if self.seconds else 0.0

    def report(self) -> str:
        lines = [f'total: {self.restart_iterations:.3g} restart-iters in '
                 f'{self.seconds:.2f}s = {self.rate:.3g} restart-iter/s']
        for s in self.sections:
            lines.append(f"  [{s['label']}] {s['restart_iterations']:.3g} in "
                         f"{s['seconds']:.2f}s = {s['rate']:.3g}/s")
        return '\n'.join(lines)


# --------------------------------------------------------------------------
# Analytic roofline model for the fused batch-last sweep
# --------------------------------------------------------------------------

# v5e published HBM bandwidth (chip spec: 819 GB/s).
V5E_HBM_GBPS = 819.0
# v5e f32 VPU FMA peak, derived from published chip numbers: the 197 Tflop/s
# bf16 MXU figure at 2 flops/MAC over 4 MXUs of 128x128 implies a ~1.5 GHz
# clock; the VPU is (8, 128) lanes x 4 ALUs x 2 flops (FMA) at that clock
# = ~12.3 Tflop/s f32. This is the all-FMA upper bound; real elementwise
# mixes (transcendentals, transposes, non-FMA adds) sit well below it, and
# for this op mix HBM bandwidth is the binding roofline (RESULTS_r2.md).
V5E_VPU_FMA_TFLOPS = 12.3


def roofline_model(num_qubits: int, num_cp_gates: int,
                   rotation_gates: str = 'xyz', kind: str = 'hst',
                   reversible: bool = True) -> dict:
    """Per-restart-iteration flop/byte model of the fused batch-last sweep
    (sim/batched.py), so bench artifacts carry auditable arithmetic instead
    of prose (VERDICT r3 item 5).

    Flop accounting (1 cmul = 6 flops, 1 cadd = 2):
      * 2q block apply (`_apply_gate_batched`, 4x4 complex): each of the E
        output entries is a 4-term complex dot = 4 cmul + 3 cadd = 30 flops.
      * 1q surface apply (2x2): 2 cmul + 1 cadd = 14 flops per entry.
      * block matrix construction (kron 16 cmul + 4x4 matmul per rotation
        letter, batch-sized not state-sized): 576 flops per letter.
      * hst/disc loss: one cmul+cadd per entry forward (8E), an elementwise
        cmul-sized backward (6E).
      * reversible backward per gate: rewind apply + cotangent apply (2x the
        forward apply) + the gate-cotangent outer contraction
        (16 gate entries x E/4 complex FMAs = 32E flops for 2q, 16E for 1q)
        — the ">=3 forward-equivalent passes" adjoint floor of RESULTS_r2.

    Byte accounting: every gate application's length-4 reduction ends an XLA
    fusion, costing one full-tensor HBM round trip (read + write = 16E
    bytes complex64); the backward pass makes 3 application-sized trips per
    gate (rewind, cotangent, gradient contraction read).

    E = 4^num_qubits entries for unitary losses; the state-prep kind builds
    only the |0..0> column, E = 2^num_qubits.

    Returns {'flops', 'hbm_bytes', 'forward_flops', 'applications'} per
    restart-iteration (Adam update and penalty terms are O(P) and omitted;
    P/E < 0.2% at the bench workload).
    """
    n, k = num_qubits, num_cp_gates
    E = (2 ** n) if kind == 'state' else (4 ** n)
    nrot = len(rotation_gates)

    apply2, apply1 = 30 * E, 14 * E
    block_build = 576 * nrot            # batch-sized, not state-sized
    loss_fwd, loss_bwd = 8 * E, 6 * E

    forward = k * (apply2 + block_build) + n * apply1 + loss_fwd
    flops = forward
    applications = k + n + 1            # fusion-ending HBM round trips
    if reversible:
        bwd2 = 2 * apply2 + 32 * E + block_build
        bwd1 = 2 * apply1 + 16 * E
        flops = forward + k * bwd2 + n * bwd1 + loss_bwd
        applications += 3 * (k + n) + 1
    hbm_bytes = applications * 16 * E
    return {'flops': flops, 'hbm_bytes': hbm_bytes,
            'forward_flops': forward, 'applications': applications}
