"""The composite relative-phase toffoli-6 identity (benchmarks/composite.py
build_relphase_toff6_composite):

    W6 = CsqrtX(4,5) . W5^dag . CsqrtX^dag(4,5) . W5 . RC4sqrtX(0123->5)
       = C5X(01234->5) . D

for ANY diagonal gauges on W5 (relative-phase toffoli-5) and RC4sqrtX
(relative-phase C4-sqrt-X), with D diagonal. Two structural facts make it
work, both exercised here with random gauges:

  * W5's gauge cancels in W5^dag ... W5 because the CsqrtX in between is
    diagonal on W5's control wires (controls-preserving conjugation);
  * RC4sqrtX's gauge sits in the RIGHTMOST slot, so any diagonal rides
    through the product unchanged.

This reduces block B of the toffoli-7 program to 5q hunts only — the 6q
raw stage floors orders above entry_loss (RESULTS_r4 sections 13/16)
while 5q hunts converge reliably.
"""

import numpy as np
import pytest


def _embed(u, wires, n):
    """Embed a 2^k unitary on `wires` (big-endian, qubit 0 = MSB) into n
    qubits — test-local reference implementation, O(8^n) but n=6 only."""
    k = len(wires)
    out = np.zeros((2 ** n, 2 ** n), dtype=complex)
    for col in range(2 ** n):
        bits = [(col >> (n - 1 - q)) & 1 for q in range(n)]
        sub_in = 0
        for w in wires:
            sub_in = (sub_in << 1) | bits[w]
        for sub_out in range(2 ** k):
            amp = u[sub_out, sub_in]
            if amp == 0:
                continue
            nb = bits[:]
            for i, w in enumerate(wires):
                nb[w] = (sub_out >> (k - 1 - i)) & 1
            row = 0
            for b in nb:
                row = (row << 1) | b
            out[row, col] += amp
    return out


@pytest.mark.parametrize('seed', [0, 7])
def test_composite_w6_identity_random_gauges(seed):
    from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                      multi_controlled_x)

    rng = np.random.default_rng(seed)
    n = 6
    D5 = np.diag(np.exp(1j * rng.uniform(0, 2 * np.pi, 32)))
    Dc = np.diag(np.exp(1j * rng.uniform(0, 2 * np.pi, 32)))
    W5 = multi_controlled_x(5).astype(complex) @ D5
    RC4 = multi_controlled_sqrt_x(5).astype(complex) @ Dc

    sx = np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]], dtype=complex) / 2
    csx = np.eye(4, dtype=complex)
    csx[2:, 2:] = sx

    W5e = _embed(W5, [0, 1, 2, 3, 4], n)
    CSX = _embed(csx, [4, 5], n)
    RC4e = _embed(RC4, [0, 1, 2, 3, 5], n)
    W6 = CSX @ W5e.conj().T @ CSX.conj().T @ W5e @ RC4e

    C5X = multi_controlled_x(6).astype(complex)
    M = C5X.conj().T @ W6
    off = np.abs(M - np.diag(np.diag(M))).max()
    assert off < 1e-12, 'W6 is not C5X times a diagonal'
    assert np.abs(np.abs(np.diag(M)) - 1).max() < 1e-12


def test_composite_w6_needs_rightmost_slot():
    """Counterexample guard: the SAME construction with the relative-phase
    block moved to the exact-block slot of the toffoli-6 recursion (i.e.
    claiming an exact toffoli-6 from a gauged C4-sqrt-X) must FAIL — the
    diagonal rides through to the output. Pins why build_toffoli6_connected
    requires the exact 36-CZ c4sqrtx while build_relphase_toff6_composite
    may use the cheap gauged one."""
    from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                      multi_controlled_x)

    rng = np.random.default_rng(3)
    n = 6
    Dc = np.diag(np.exp(1j * rng.uniform(0, 2 * np.pi, 32)))
    W5 = multi_controlled_x(5).astype(complex)  # exact W5 for clarity
    RC4 = multi_controlled_sqrt_x(5).astype(complex) @ Dc

    sx = np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]], dtype=complex) / 2
    csx = np.eye(4, dtype=complex)
    csx[2:, 2:] = sx

    W5e = _embed(W5, [0, 1, 2, 3, 4], n)
    CSX = _embed(csx, [4, 5], n)
    RC4e = _embed(RC4, [0, 1, 2, 3, 5], n)
    W6 = CSX @ W5e.conj().T @ CSX.conj().T @ W5e @ RC4e

    C5X = multi_controlled_x(6).astype(complex)
    # NOT equal to the exact toffoli-6 (up to global phase): hst-style
    # overlap strictly below 1
    overlap = abs(np.trace(C5X.conj().T @ W6)) / 2 ** n
    assert overlap < 0.999
