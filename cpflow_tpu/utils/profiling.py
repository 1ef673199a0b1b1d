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
