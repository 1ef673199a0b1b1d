"""The `cpflow` compatibility package: reference-style notebook imports
(paper/peppar.ipynb, tutorial/CPFlow_tutorial.ipynb) must run unchanged
against the TPU implementation."""

import numpy as np
import pytest


def test_peppar_import_block():
    # the exact import lines from the reference paper notebook (sans the
    # qiskit/pandas cells, which are third-party interop)
    import cpflow
    from cpflow import (Ansatz, AdaptiveOptions, Decomposition, Results,  # noqa: F401
                        StaticOptions, Synthesize)
    from cpflow.exact_decompositions import (rationalize_all_rgates,  # noqa: F401
                                             reduce_angles,
                                             remove_zero_rgates)
    from cpflow.gates import u_toff3, u_toff4, u_toff5  # noqa: F401
    from cpflow.main import RegularizationOptions  # noqa: F401
    from cpflow.matrix_utils import (cost_HST, disc_modulo_diagonal,  # noqa: F401
                                     theoretical_lower_bound)
    from cpflow.penalty import make_regularization_function  # noqa: F401
    from cpflow.topology import chain_layer, connected_layer, fill_layers  # noqa: F401
    from cpflow.trigonometric_utils import bracket_angle, random_angles  # noqa: F401
    from cpflow.cp_utils import make_regularization_function as mrf  # noqa: F401
    from cpflow.optimization import mynimize, mynimize_repeated  # noqa: F401
    from cpflow.circuit_assembly import apply_gate_to_tensor  # noqa: F401
    from cpflow.exact_decompositions import convert_to_ZXZ  # noqa: F401

    assert cpflow.Synthesize is Synthesize
    assert u_toff3.shape == (8, 8)


@pytest.mark.slow
def test_reference_style_static_run():
    from cpflow import Synthesize, StaticOptions
    from cpflow.gates import u_ccz3
    from cpflow.topology import chain_layer

    s = Synthesize(chain_layer(3), target_unitary=u_ccz3, label='shim',
                   mesh=None)
    opts = StaticOptions(num_cp_gates=12, num_samples=16,
                         accepted_num_cz_gates=8, num_gd_iterations=800,
                         num_gd_iterations_at_verification=1500)
    res = s.static(opts, save_results=False, verbose=False)
    assert any(d.cz_count <= 8 for d in res.decompositions)


def test_gates_count_depth_contract():
    from cpflow.exact_decompositions import gates_count, gates_depth
    from cpflow_tpu.circuits.ir import Circuit

    c = Circuit(2)
    c.cz(0, 1).rz(0.3, 0).cz(0, 1)
    assert gates_count(c) == 2
    assert gates_depth(c, ('cz',)) == 2


def test_circuit_inverse():
    import math
    import numpy as np
    from cpflow_tpu.circuits.ir import Circuit

    c = Circuit(3)
    c.rz(0.7, 0).cz(0, 1).cp(1.1, 1, 2).h(2).t(0).sdg(1).cx(2, 1)
    u = c.unitary()
    v = c.inverse().unitary()
    np.testing.assert_allclose(u @ v, np.eye(8), atol=1e-10)


def test_toffoli5_chain_composite_identity():
    """The paper's 48-CZ chain toffoli-5 assembly (sec toff5): exact with
    ideal blocks, tolerant of arbitrary relative phases on qubits 0-3."""
    import math
    import numpy as np
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.circuits.passes import hst_distance
    from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                      multi_controlled_x, u_toff5)

    # ideal blocks: W = D . toffoli4 with a random diagonal D
    rng = np.random.default_rng(7)
    d_phases = np.exp(1j * rng.uniform(0, 2 * np.pi, 16))

    def w_mat():
        return np.diag(d_phases) @ multi_controlled_x(4)

    w = Circuit(4); w.append('W', (0, 1, 2, 3), matrix=w_mat())
    c3 = Circuit(4); c3.append('C3SX', (0, 1, 2, 3),
                               matrix=multi_controlled_sqrt_x(4))

    qc = Circuit(5)
    qc.h(4); qc.cp(math.pi / 2, 3, 4); qc.h(4)
    qc.compose(w.inverse(), qubits=[0, 1, 2, 3])
    qc.h(4); qc.cp(-math.pi / 2, 3, 4); qc.h(4)
    qc.compose(w, qubits=[0, 1, 2, 3])
    qc.cx(4, 3); qc.cx(3, 4)
    qc.compose(c3, qubits=[0, 1, 2, 3])
    qc.cx(3, 4); qc.cx(4, 3)

    assert hst_distance(qc.unitary(), u_toff5.astype(np.complex128)) < 1e-10


def test_toffoli5_connected_composite_identity():
    """The connected 30-CZ toffoli-5 assembly (benchmarks/composite.py
    build_toffoli5_connected): exact with ideal blocks — full connectivity
    drops the 4-CX routing, C3-sqrt-X acts directly on (0,1,2,4) — and
    tolerant of arbitrary relative phases on qubits 0-3."""
    import math
    import numpy as np
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.circuits.passes import hst_distance
    from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                      multi_controlled_x, u_toff5)

    rng = np.random.default_rng(11)
    d_phases = np.exp(1j * rng.uniform(0, 2 * np.pi, 16))
    w = Circuit(4)
    w.append('W', (0, 1, 2, 3),
             matrix=np.diag(d_phases) @ multi_controlled_x(4))
    c3 = Circuit(4)
    c3.append('C3SX', (0, 1, 2, 3), matrix=multi_controlled_sqrt_x(4))

    qc = Circuit(5)
    qc.h(4); qc.cp(math.pi / 2, 3, 4); qc.h(4)
    qc.compose(w.inverse(), qubits=[0, 1, 2, 3])
    qc.h(4); qc.cp(-math.pi / 2, 3, 4); qc.h(4)
    qc.compose(w, qubits=[0, 1, 2, 3])
    qc.compose(c3, qubits=[0, 1, 2, 4])

    assert hst_distance(qc.unitary(), u_toff5.astype(np.complex128)) < 1e-10


def test_toffoli6_connected_composite_identity():
    """The toffoli-6 recursion (benchmarks/composite.py
    build_toffoli6_connected) — beyond the reference paper: exact with
    ideal blocks, tolerant of arbitrary relative phases on qubits 0-4."""
    import math
    import numpy as np
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.circuits.passes import hst_distance
    from cpflow_tpu.ops.gates import multi_controlled_sqrt_x, multi_controlled_x

    rng = np.random.default_rng(3)
    d_phases = np.exp(1j * rng.uniform(0, 2 * np.pi, 32))
    w = Circuit(5)
    w.append('W', (0, 1, 2, 3, 4),
             matrix=np.diag(d_phases) @ multi_controlled_x(5))
    c4 = Circuit(5)
    c4.append('C4SX', (0, 1, 2, 3, 4), matrix=multi_controlled_sqrt_x(5))

    qc = Circuit(6)
    qc.h(5); qc.cp(math.pi / 2, 4, 5); qc.h(5)
    qc.compose(w.inverse(), qubits=[0, 1, 2, 3, 4])
    qc.h(5); qc.cp(-math.pi / 2, 4, 5); qc.h(5)
    qc.compose(w, qubits=[0, 1, 2, 3, 4])
    qc.compose(c4, qubits=[0, 1, 2, 3, 5])

    tgt = multi_controlled_x(6).astype(np.complex128)
    assert hst_distance(qc.unitary(), tgt) < 1e-10


def test_x_root_gate():
    """multi_controlled_x_root: root=2 reproduces multi_controlled_sqrt_x,
    and squaring the X^(1/4) block gives the X^(1/2) block."""
    import numpy as np
    from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                      multi_controlled_x_root)

    np.testing.assert_allclose(multi_controlled_x_root(4, 2),
                               multi_controlled_sqrt_x(4), atol=1e-7)
    r4 = multi_controlled_x_root(3, 4).astype(np.complex128)
    np.testing.assert_allclose(r4 @ r4, multi_controlled_sqrt_x(3),
                               atol=1e-7)


def test_c5sqrtx_composite_identity():
    """Inner level of the toffoli-7 program (benchmarks/composite.py
    build_c5sqrtx_connected): C5(X^1/2) from C4(X^1/4) + a relative-phase
    toffoli-5, exact with ideal blocks, tolerant of arbitrary relative
    phases on qubits 0-4."""
    import math
    import numpy as np
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.circuits.passes import hst_distance
    from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                      multi_controlled_x,
                                      multi_controlled_x_root)

    rng = np.random.default_rng(5)
    w5 = Circuit(5)
    w5.append('W5', (0, 1, 2, 3, 4),
              matrix=np.diag(np.exp(1j * rng.uniform(0, 2 * np.pi, 32)))
              @ multi_controlled_x(5))
    c4r = Circuit(5)
    c4r.append('C4XR4', (0, 1, 2, 3, 4),
               matrix=multi_controlled_x_root(5, 4))

    qc = Circuit(6)
    qc.h(5); qc.cp(math.pi / 4, 4, 5); qc.h(5)
    qc.compose(w5.inverse(), qubits=[0, 1, 2, 3, 4])
    qc.h(5); qc.cp(-math.pi / 4, 4, 5); qc.h(5)
    qc.compose(w5, qubits=[0, 1, 2, 3, 4])
    qc.compose(c4r, qubits=[0, 1, 2, 3, 5])

    tgt = multi_controlled_sqrt_x(6).astype(np.complex128)
    assert hst_distance(qc.unitary(), tgt) < 1e-10


def test_toffoli7_connected_composite_identity():
    """The toffoli-7 recursion (benchmarks/composite.py
    build_toffoli7_connected) — TWO levels beyond the reference paper:
    exact with ideal blocks, tolerant of arbitrary relative phases in
    BOTH W5 (on qubits 0-4) and W6 (on qubits 0-5)."""
    import math
    import numpy as np
    from cpflow_tpu.circuits.ir import Circuit
    from cpflow_tpu.circuits.passes import hst_distance
    from cpflow_tpu.ops.gates import (multi_controlled_x,
                                      multi_controlled_x_root)

    rng = np.random.default_rng(13)
    w5 = Circuit(5)
    w5.append('W5', (0, 1, 2, 3, 4),
              matrix=np.diag(np.exp(1j * rng.uniform(0, 2 * np.pi, 32)))
              @ multi_controlled_x(5))
    w6 = Circuit(6)
    w6.append('W6', (0, 1, 2, 3, 4, 5),
              matrix=np.diag(np.exp(1j * rng.uniform(0, 2 * np.pi, 64)))
              @ multi_controlled_x(6))
    c4r = Circuit(5)
    c4r.append('C4XR4', (0, 1, 2, 3, 4),
               matrix=multi_controlled_x_root(5, 4))

    # inner C5(X^1/2) on (0,1,2,3,4 -> 5) of a 6q sub-circuit
    c5 = Circuit(6)
    c5.h(5); c5.cp(math.pi / 4, 4, 5); c5.h(5)
    c5.compose(w5.inverse(), qubits=[0, 1, 2, 3, 4])
    c5.h(5); c5.cp(-math.pi / 4, 4, 5); c5.h(5)
    c5.compose(w5, qubits=[0, 1, 2, 3, 4])
    c5.compose(c4r, qubits=[0, 1, 2, 3, 5])

    qc = Circuit(7)
    qc.h(6); qc.cp(math.pi / 2, 5, 6); qc.h(6)
    qc.compose(w6.inverse(), qubits=[0, 1, 2, 3, 4, 5])
    qc.h(6); qc.cp(-math.pi / 2, 5, 6); qc.h(6)
    qc.compose(w6, qubits=[0, 1, 2, 3, 4, 5])
    qc.compose(c5, qubits=[0, 1, 2, 3, 4, 6])

    tgt = multi_controlled_x(7).astype(np.complex128)
    assert hst_distance(qc.unitary(), tgt) < 1e-10
