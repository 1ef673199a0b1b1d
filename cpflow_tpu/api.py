"""User-facing API: Synthesize, Ansatz, Decomposition, Results, options.

Parity target: reference cpflow/main.py. The public surface (class names,
option dataclasses with their defaults and required-argument validation, the
Results persistence contract, the static/adaptive drivers) matches the
reference so existing workflows port directly; the execution underneath is
the TPU-native pipeline:

  * one jitted executable per (ansatz, options) configuration runs the whole
    multi-start Adam sweep, optionally sharded over a device mesh;
  * candidate evaluation and verification are batched device passes instead
    of per-sample host loops;
  * circuits are our own IR (qiskit-free), refinement runs in host float64;
  * TPE hyperparameter search is self-contained (search.tpe).

Additionally, ``target_state`` is actually implemented — the reference
advertises it in the Synthesize docstring (main.py:513) but never accepts it.
"""

from __future__ import annotations

import dataclasses
import math
import os
from dataclasses import dataclass, field, asdict
from typing import Any, Callable, List, Optional

import dill
import numpy as np

import jax
import jax.numpy as jnp

from cpflow_tpu import config
from cpflow_tpu.circuits.ir import Circuit
from cpflow_tpu.circuits.passes import cp_to_cz_circuit, convert_to_zxz
from cpflow_tpu.circuits.refine import refine as refine_circuit, host_loss_adapter
from cpflow_tpu.ops import gates, losses
from cpflow_tpu.ops.penalty import make_regularization_function
from cpflow_tpu.optimize import candidates as cand
from cpflow_tpu.optimize import engine, unitary_learn
from cpflow_tpu.parallel import mesh as mesh_lib
from cpflow_tpu.search import tpe
from cpflow_tpu.sim import batched as batched_sim
from cpflow_tpu.sim.ansatz_kernel import (build_unitary, cp_angle_indices,
                                          num_block_angles)
from cpflow_tpu.topology import fill_layers, num_qubits_from_layer


# --------------------------------------------------------------------------
# Loss specifications
# --------------------------------------------------------------------------

class LossSpec:
    """Declarative unitary loss: serializes cleanly (the reference dill-pickles
    raw closures, which its own tutorial admits is fragile — SURVEY.md §5) and
    evaluates on either substrate: jax (device pipeline) or numpy (host
    refinement)."""

    def __init__(self, kind: str, target: Optional[np.ndarray] = None,
                 fn: Optional[Callable] = None, wires: Optional[list] = None,
                 num_qubits: Optional[int] = None):
        self.kind = kind
        self.target = None if target is None else np.asarray(target)
        if kind == 'state' and self.target is not None:
            # state targets are unit vectors by definition; normalizing here
            # keeps a complex64-rounded input (norm deficit ~3e-8) from
            # flooring the infidelity of an exact circuit (RESULTS_r5)
            self.target = self.target / np.linalg.norm(self.target)
        self.fn = fn
        self.wires = wires
        self.num_qubits = num_qubits
        self._jit_fn = None  # lazy jax.jit of custom fn (see numpy())

    def __call__(self, u):
        if self.kind == 'hst':
            return losses.cost_HST(u, self.target)
        if self.kind == 'disc':
            return losses.disc(u, self.target)
        if self.kind == 'state':
            return losses.state_prep_loss(u, self.target)
        if self.kind == 'modulo_identity':
            return losses.disc_modulo_identity(self.target, u,
                                               self.num_qubits, self.wires)
        if self.kind == 'modulo_diagonal':
            return losses.disc_modulo_diagonal(self.target, u,
                                               self.num_qubits, self.wires)
        return self.fn(u)

    def numpy(self, u: np.ndarray) -> float:
        t = self.target
        if self.kind == 'hst':
            n = t.shape[0]
            return float(1 - abs((u * t.conj()).sum()) ** 2 / n ** 2)
        if self.kind == 'disc':
            n = t.shape[0]
            return float(1 - abs((u.conj() * t).sum()) / n)
        if self.kind == 'state':
            overlap = (t.conj() * u[:, 0]).sum()
            return float(1 - abs(overlap) ** 2)
        if self.kind == 'modulo_identity':
            return float(losses.disc_modulo_identity(
                t, np.asarray(u), self.num_qubits, self.wires, xp=np))
        if self.kind == 'modulo_diagonal':
            return float(losses.disc_modulo_diagonal(
                t, np.asarray(u), self.num_qubits, self.wires, xp=np))
        # Custom callables carry no substrate info: fall back to jax —
        # but ALWAYS under jit, and NEVER move a complex array across the
        # host<->device boundary. Remote TPU backends (the axon tunnel)
        # neither run eager complex primitives nor transfer complex
        # dtypes in either direction, so both an eager self.fn(u) and a
        # jit fed the complex host array crash mid-pipeline the first
        # time a decomposition is built from a custom-loss run (found by
        # the full-budget tutorial cell 26, RESULTS_r4 §6; the transfer
        # failure surfaces asynchronously at the float() readout). The
        # split re/im float inputs are recombined on-device inside the
        # trace — complex HLO executes fine, only transfers don't — and
        # the real-scalar readback is transfer-safe.
        if self._jit_fn is None:
            import jax
            fn = self.fn
            self._jit_fn = jax.jit(lambda re, im: fn(re + 1j * im))
        u = np.asarray(u)
        return float(self._jit_fn(np.ascontiguousarray(u.real),
                                  np.ascontiguousarray(u.imag)))

    def __getstate__(self):
        # never serialize the jit wrapper (it may close over backend
        # state); it is rebuilt lazily on first numpy() after load
        state = self.__dict__.copy()
        state['_jit_fn'] = None
        return state

    def __setstate__(self, state):
        # dills pickled BEFORE __getstate__ existed carry no _jit_fn key;
        # default it so numpy() rebuilds lazily instead of AttributeError
        state.setdefault('_jit_fn', None)
        self.__dict__.update(state)

    def __repr__(self):
        shape = None if self.target is None else self.target.shape
        return f'LossSpec({self.kind!r}, target_shape={shape})'


# --------------------------------------------------------------------------
# EntanglingBlock / Ansatz
# --------------------------------------------------------------------------

class EntanglingBlock:
    """Two-qubit block: entangling gate followed by a per-qubit rotation
    string (reference main.py:23-82)."""

    @staticmethod
    def get_num_angles(entangling_gate_name: str, rotation_gates: str) -> int:
        return num_block_angles(entangling_gate_name, rotation_gates)

    def __init__(self, entangling_gate_name: str, rotation_gates: str, angles):
        self.entangling_gate_name = entangling_gate_name
        self.rotation_gates = rotation_gates
        self.angles = angles
        self.num_angles = self.get_num_angles(entangling_gate_name, rotation_gates)

    def circuit(self) -> Circuit:
        qc = Circuit(2)
        a = np.asarray(self.angles)
        if self.entangling_gate_name == 'cp':
            qc.cp(float(a[-1]), 0, 1)
        else:
            qc.append(self.entangling_gate_name, (0, 1))
        for i, letter in enumerate(self.rotation_gates):
            qc.append('r' + letter, 0, float(a[2 * i]))
            qc.append('r' + letter, 1, float(a[2 * i + 1]))
        return qc

    def unitary(self):
        from cpflow_tpu.sim.ansatz_kernel import block_matrix
        return block_matrix(self.entangling_gate_name, self.rotation_gates,
                            jnp.asarray(self.angles, dtype=config.real_dtype))


class Ansatz:
    """Template circuit builder + trainer (reference main.py:149-239).

    Attributes mirror the reference: num_qubits, entangling_gate_name,
    rotation_gates, placements {'layers': [layer, n], 'free': [...]},
    all_placements, num_angles, cp_mask, and `.unitary` (a jax-traceable
    angles->matrix function).
    """

    def __init__(self, num_qubits: int, entangling_gate_name: str,
                 placements: dict, rotation_gates: str = 'xyz'):
        self.num_qubits = num_qubits
        self.entangling_gate_name = entangling_gate_name
        self.rotation_gates = rotation_gates

        placements.setdefault('layers', [[], 0])
        placements.setdefault('free', [])
        self.placements = placements
        self.layer, self.num_layers = placements['layers']
        self.free_placements = placements['free']
        self.all_placements = list(self.layer) * self.num_layers + list(self.free_placements)
        self.num_blocks = len(self.all_placements)

        nba = num_block_angles(entangling_gate_name, rotation_gates)
        self.num_block_angles = nba
        self.num_angles = 3 * num_qubits + nba * self.num_blocks

        if entangling_gate_name == 'cp':
            mask = np.zeros(self.num_angles, dtype=np.float32)
            mask[cp_angle_indices(num_qubits, nba, self.num_blocks)] = 1.0
            self.cp_mask = jnp.asarray(mask)
        else:
            self.cp_mask = None

        self.unitary = lambda angles: build_unitary(
            self.num_qubits, self.entangling_gate_name, self.rotation_gates,
            self.placements, angles)

    def circuit(self, angles=None) -> Circuit:
        """IR circuit at the given angles (reference main.py:193-222).
        With angles=None, rotation parameters are labelled placeholders."""
        if angles is None:
            angles = [_Param(f'a_{i}') for i in range(self.num_angles)]
        a = list(angles)
        nba = self.num_block_angles

        qc = Circuit(self.num_qubits)
        for q in range(self.num_qubits):
            qc.append('rz', q, a[3 * q + 0])
            qc.append('rx', q, a[3 * q + 1])
            qc.append('rz', q, a[3 * q + 2])
        base = 3 * self.num_qubits
        for b, p in enumerate(self.all_placements):
            block = a[base + b * nba: base + (b + 1) * nba]
            if self.entangling_gate_name == 'cp':
                qc.append('cp', tuple(p), block[-1])
            else:
                qc.append(self.entangling_gate_name, tuple(p))
            for i, letter in enumerate(self.rotation_gates):
                qc.append('r' + letter, p[0], block[2 * i])
                qc.append('r' + letter, p[1], block[2 * i + 1])
        return qc

    def learn(self, u_target, method='adam', learning_rate=0.1,
              target_loss=1e-7, keep_history=True, **kwargs):
        """Multi-start learning of a target unitary (reference main.py:224-239)."""
        return unitary_learn(self.unitary, u_target, self.num_angles,
                             method=method, learning_rate=learning_rate,
                             target_loss=target_loss,
                             keep_history=keep_history, **kwargs)


class _Param(float):
    """Labelled placeholder parameter for parametrized circuit rendering."""
    def __new__(cls, name):
        obj = super().__new__(cls, float('nan'))
        obj.name = name
        return obj

    def __repr__(self):
        return self.name

    def __format__(self, spec):
        return self.name


# --------------------------------------------------------------------------
# Decomposition
# --------------------------------------------------------------------------

class Decomposition:
    """A found decomposition: circuit, loss, CZ metrics, refinement
    (reference main.py:242-325)."""

    def __init__(self, unitary_loss_func, circuit: Circuit, label: str = '',
                 type: str = 'Approximate'):
        self.unitary_loss_func = unitary_loss_func
        self.circuit = circuit
        self.unitary = circuit.unitary()
        self.label = label
        self.loss = host_loss_adapter(unitary_loss_func)(self.unitary)
        self.type = type
        self.cz_count = circuit.gates_count(['cz'])
        self.cz_depth = circuit.gates_depth(['cz'])
        self.t_count = None
        self.t_depth = None

        self._cp_data = None
        self._static_options = None
        self._adaptive_options = None
        self._decomposer = None

    @classmethod
    def _from_cp_circuit(cls, unitary_loss_func, anz: Ansatz, angles,
                         label: str = '') -> 'Decomposition':
        """Build from a verified CP-ansatz angle vector: render the circuit,
        project CP gates (already frozen to exact 0/pi by verification),
        convert 1q runs to ZXZ (reference main.py:282-291)."""
        angles = np.asarray(angles, dtype=float)
        qc = anz.circuit(list(angles))
        qc = cp_to_cz_circuit(qc, cp_threshold=1e-6)
        qc = convert_to_zxz(qc)
        d = cls(unitary_loss_func, qc, label=label)
        d._cp_data = [anz.placements, angles]
        return d

    def refine(self, max_denominator=32, angle_threshold=0.01,
               cp_threshold=0.01, reduce_threshold=1e-5,
               recursion_degree=0, recursion_depth=5):
        """Simplify angles, rationalize, Clifford+T (reference main.py:293-319)."""
        qc, refine_type, t_count, t_depth = refine_circuit(
            self.circuit, self.unitary_loss_func,
            max_denominator=max_denominator,
            angle_threshold=angle_threshold, cp_threshold=cp_threshold,
            reduce_threshold=reduce_threshold,
            recursion_degree=recursion_degree,
            recursion_depth=recursion_depth)

        self.type = refine_type
        self.circuit = qc
        self.unitary = qc.unitary()
        self.loss = host_loss_adapter(self.unitary_loss_func)(self.unitary)
        self.cz_count = qc.gates_count(['cz'])
        self.cz_depth = qc.gates_depth(['cz'])
        if refine_type == 'Clifford+T':
            self.t_count = t_count
            self.t_depth = t_depth
        return f'Refined to {refine_type}'

    def __repr__(self):
        description = (f"< {self.label}| {self.type} | loss: {self.loss}  "
                       f"| CZ count: {self.cz_count} | CZ depth: {self.cz_depth}  >")
        if self.type == 'Clifford+T':
            description = (description[:-1]
                           + f'| T count: {self.t_count} | T depth: {self.t_depth} >')
        return description


# --------------------------------------------------------------------------
# Options
# --------------------------------------------------------------------------

@dataclass
class RegularizationOptions:
    function: str = 'linear'
    ymax: float = 2
    xmax: float = math.pi / 2
    plato_0: float = 0.05
    plato_1: float = 0.05
    plato_2: float = 0.05


@dataclass
class BasicOptions:
    """Options shared by static and adaptive synthesis (reference
    main.py:338-367; identical fields and defaults)."""
    num_samples: int = 100
    method: str = 'adam'
    learning_rate: float = 0.1
    num_gd_iterations: int = 2000
    cp_distribution: str = 'uniform'
    entry_loss: float = 1e-3
    target_loss: float = 1e-6
    threshold_cp: float = 0.2
    learning_rate_at_verification: float = 0.01
    num_gd_iterations_at_verification: int = 5000
    random_seed: int = 0
    rotation_gates: str = 'xyz'
    # unsafe_batch=True downgrades the measured TPU-worker crash envelope
    # (RESULTS_r3.md §1/§18: 6q @ batch 4096 kills a v5e worker outright;
    # 5q @ effective batch 4096 at paper-scale k does too) from a hard
    # ValueError to the legacy warning. A crashed worker can take the
    # shared backend down for hours — never set this on shared hardware.
    unsafe_batch: bool = False
    # num_gd_segments > 1 chains that many dispatches of the SAME compiled
    # num_gd_iterations sweep, each resuming from the previous segment's
    # best-so-far parameters (fresh Adam moments per segment). Effective
    # descent depth = segments x num_gd_iterations WITHOUT lengthening the
    # single-dispatch program — the lever for the measured 6q dispatch-depth
    # wall (8000-iter single dispatches crash the v5e tunnel worker while
    # 4000-iter ones pass, RESULTS_r4 §15). Best-so-far tracking makes each
    # segment's result at least as good as the previous one's. Honored by
    # the bucketed adaptive stage (the hunt hot path) and the batched
    # verification stage (where the target_loss early exit makes extra
    # segments nearly free once every candidate has converged).
    num_gd_segments: int = 1


@dataclass
class StaticOptions(BasicOptions):
    """Static synthesis options (reference main.py:370-388)."""
    num_cp_gates: int = -1
    r: float = 0.00055
    accepted_num_cz_gates: int = -1

    def __post_init__(self):
        if self.num_cp_gates == -1:
            raise TypeError("Missing required argument 'num_cp_gates'")
        if self.accepted_num_cz_gates == -1:
            raise TypeError("Missing required argument 'accepted_num_cz_gates'")


@dataclass
class AdaptiveOptions(BasicOptions):
    """Adaptive synthesis options (reference main.py:391-426)."""
    min_num_cp_gates: int = -1
    max_num_cp_gates: int = -1
    r_mean: float = 0.00055
    r_variance: float = 0.5
    max_evals: int = 100
    target_num_cz_gates: int = 0
    stop_if_target_reached: bool = False
    keep_logs: bool = False
    # bucketed=True compiles ONE executable for the whole search: the
    # template is padded to max_num_cp_gates and each trial's shorter
    # template is realized by freezing the tail blocks at identity (CP(0)=Id,
    # R(0)=Id) with a runtime mask; the regularization weight r is also a
    # runtime argument. Recommended whenever compilation is expensive
    # (every distinct num_cp_gates otherwise compiles its own program).
    # Trials are NOT bit-identical to the unbucketed mode (the PRNG draws
    # max-length angle vectors), but the search semantics are the same.
    bucketed: bool = False
    # parallel_trials > 1 evaluates that many TPE suggestions per device
    # dispatch (constant-liar batching through the vmapped bucketed stage):
    # suggestions after the first are drawn against provisional trials whose
    # scores are the mean observed score, so the batch stays diverse.
    # Sequential-TPE semantics (the reference's) is the default (1). The
    # dispatch holds parallel_trials x num_samples restarts in memory.
    parallel_trials: int = 1

    def __post_init__(self):
        if self.min_num_cp_gates == -1:
            raise TypeError("Missing required argument 'min_num_cp_gates'")
        if self.max_num_cp_gates == -1:
            raise TypeError("Missing required argument 'max_num_cp_gates'")
        if self.bucketed and self.method != 'adam':
            import warnings
            warnings.warn(
                f"bucketed=True always runs the fused Adam sweep; "
                f"method={self.method!r} is ignored in the raw stage "
                f"(set bucketed=False to honor it)", stacklevel=2)

    def get_static(self, num_cp_gates, r) -> StaticOptions:
        default_static = asdict(BasicOptions())
        options_dict = asdict(self)
        basic = {k: v for k, v in options_dict.items() if k in default_static}
        basic['num_cp_gates'] = num_cp_gates
        basic['r'] = r
        # adaptive trials filter on entry_loss only; any CZ count may enter
        basic['accepted_num_cz_gates'] = np.iinfo(np.int32).max
        return StaticOptions(**basic)


# --------------------------------------------------------------------------
# Results
# --------------------------------------------------------------------------

@dataclass
class Results:
    """Persistent store of trials + decompositions (reference main.py:429-502)."""
    loss_function: Any
    layer: list
    label: str = ''
    trials: Any = None
    decompositions: tuple = ()
    save_to: str = ''

    def __post_init__(self):
        if self.save_to == '':
            self.save_to = f'results/{self.label}'

    def save(self):
        os.makedirs(os.path.dirname(self.save_to) or '.', exist_ok=True)
        with open(self.save_to, 'wb') as f:
            dill.dump(self, f)

    @staticmethod
    def load(path: str) -> 'Results':
        try:
            with open(path, 'rb') as f:
                return dill.load(f)
        except Exception:
            # fall back to the reference-pickle migration loader: the
            # reference's own stored Results (dill pickles of its classes +
            # hyperopt Trials + qiskit circuits) load and are repaired into
            # working native objects (cpflow_tpu.migrate)
            from cpflow_tpu.migrate import load_reference_results
            return load_reference_results(path)

    def best_hyperparameters(self) -> List[List]:
        """[num_cp_gates, r] pairs ordered by increasing score
        (reference main.py:471-477)."""
        results = sorted(self.trials.results, key=lambda res: res['loss'])
        return [[res['num_cp_gates'], res['r']] for res in results]

    def plot_trials(self):
        """(k, r) -> score scatter (reference main.py:479-502)."""
        import matplotlib.pyplot as plt
        results = self.trials.results
        num = np.array([res['num_cp_gates'] for res in results], dtype=float)
        r = np.array([res['r'] for res in results], dtype=float)
        loss = np.array([res['loss'] for res in results], dtype=float)

        finite = np.isfinite(loss)
        n_best, r_best = self.best_hyperparameters()[0]

        plt.scatter(num[finite], r[finite], c=loss[finite], cmap='jet',
                    edgecolors='black')
        plt.colorbar()
        plt.scatter(num[~finite], r[~finite], marker='x', color='red')
        plt.scatter([n_best], [r_best], marker='*', facecolors='gold',
                    edgecolors='black', s=[250])
        plt.xlabel('Number of CP gates')
        plt.ylabel('r: regularization weight')
        plt.title('Score')


# --------------------------------------------------------------------------
# Synthesize
# --------------------------------------------------------------------------

class Synthesize:
    """Automated synthesis of unitaries into CZ + 1q rotations
    (reference main.py:505-864).

    Args (reference-compatible, plus target_state which the reference
    documents but never implemented, and mesh for TPU scale-out):
        layer: connectivity pairs, e.g. [[0,1],[1,2]].
        unitary_loss_func: custom loss on the unitary (callable or LossSpec).
        target_unitary: sets the loss to HS-test distance to this matrix.
        target_state: sets the loss to 1 - |<target|U|0>|^2.
        label: name used for persistence.
        cp_regularization_func: per-angle CP penalty (default: piecewise
            linear with RegularizationOptions defaults).
        mesh: jax.sharding.Mesh to shard the restart batch over ('auto' =
            all visible devices when more than one; None = single device).
    """

    def __init__(self, layer, unitary_loss_func=None, target_unitary=None,
                 target_state=None, label=None, cp_regularization_func=None,
                 mesh='auto'):
        self.layer = layer
        self.num_qubits = num_qubits_from_layer(layer)
        self.target_unitary = target_unitary

        if unitary_loss_func is not None:
            if isinstance(unitary_loss_func, LossSpec):
                self.unitary_loss_func = unitary_loss_func
            else:
                self.unitary_loss_func = LossSpec('custom', fn=unitary_loss_func)
        elif target_unitary is not None:
            d = 2 ** self.num_qubits
            assert np.shape(target_unitary) == (d, d), \
                'Number of qubits in target unitary and layer do not match.'
            self.unitary_loss_func = LossSpec('hst', target=target_unitary)
        elif target_state is not None:
            d = 2 ** self.num_qubits
            assert np.shape(target_state) == (d,), \
                'Number of qubits in target state and layer do not match.'
            self.unitary_loss_func = LossSpec('state', target=target_state)
        else:
            raise AssertionError(
                'Neither unitary loss function nor target unitary/state is provided.')

        self.label = label
        if cp_regularization_func:
            self.cp_regularization_func = cp_regularization_func
        else:
            self.cp_regularization_func = make_regularization_function(
                RegularizationOptions)

        if mesh == 'auto':
            devices = jax.devices()
            self.mesh = mesh_lib.restart_mesh(devices) if len(devices) > 1 else None
        else:
            self.mesh = mesh

    def __getstate__(self):
        # Device handles and compiled executables are process-local and
        # unpicklable; decompositions carry their _decomposer for provenance
        # (reference main.py:634), so drop them on serialization — both are
        # rebuilt lazily on next use.
        state = self.__dict__.copy()
        state['mesh'] = None
        state.pop('_stage_cache', None)
        return state

    # -- internals ----------------------------------------------------------

    def _ansatz(self, options) -> Ansatz:
        return Ansatz(self.num_qubits, 'cp',
                      fill_layers(self.layer, options.num_cp_gates),
                      options.rotation_gates)

    def _loss_and_reg(self, anz: Ansatz, options):
        loss_func = lambda angles: self.unitary_loss_func(anz.unitary(angles))
        reg_func = lambda angs: options.r * self.cp_regularization_func(
            angs * anz.cp_mask).sum()
        return loss_func, reg_func

    @staticmethod
    def _plot_raw(res):
        """Plot regloss/loss/reg learning curves of one restart
        (reference main.py:550-556; needs keep_history=True histories)."""
        import matplotlib.pyplot as plt
        plt.plot(np.asarray(res['regloss']), label='regloss')
        plt.plot(np.asarray(res['loss']), label='loss')
        plt.plot(np.asarray(res['reg']), label='reg')
        plt.yscale('log')
        plt.legend()

    @staticmethod
    def _generate_initial_angles(key, num_angles, cp_mask, cp_dist='uniform',
                                 batch_size=1):
        return cand.generate_initial_angles_batch(
            key, num_angles, cp_mask, cp_dist=cp_dist, batch_size=batch_size)

    def _generate_raw(self, options, initial_angles_array=None,
                      keep_history=False) -> engine.RawResult:
        """Multi-start raw sampling stage (reference main.py:558-587):
        one jitted executable, restart axis optionally sharded over the mesh.

        The default 'adam' method takes the fused batch-last kernel
        (sim.batched) — restarts minor-most, no per-restart dot_generals;
        other methods (preconditioned / coordinate descent) take the generic
        vmapped engine.
        """
        anz = self._ansatz(options)

        batch_size = mesh_lib.padded_batch_size(options.num_samples, self.mesh)
        if initial_angles_array is None:
            key = jax.random.PRNGKey(options.random_seed)
            initial_angles_array = self._generate_initial_angles(
                key, anz.num_angles, anz.cp_mask,
                cp_dist=options.cp_distribution, batch_size=batch_size)

        sharding = mesh_lib.restart_sharding(self.mesh) if self.mesh else None

        if options.method == 'adam':
            regloss_fn = batched_sim.make_batched_regloss(
                self.num_qubits, 'cp', options.rotation_gates, anz.placements,
                self.unitary_loss_func, cp_mask=anz.cp_mask,
                regularization_func=self.cp_regularization_func, r=options.r,
                reversible=True)
            return engine.minimize_fused(
                regloss_fn, initial_angles_array,
                learning_rate=options.learning_rate,
                num_iterations=options.num_gd_iterations,
                keep_history=keep_history, sharding=sharding)

        loss_func, reg_func = self._loss_and_reg(anz, options)
        return engine.minimize_multistart(
            loss_func, initial_angles_array, method=options.method,
            learning_rate=options.learning_rate,
            num_iterations=options.num_gd_iterations,
            keep_history=keep_history, regularization_func=reg_func,
            u_func=anz.unitary, sharding=sharding)

    def _evaluate_raw(self, raw: engine.RawResult, options) -> cand.EvaluatedBatch:
        anz = self._ansatz(options)
        return cand.evaluate_raw_batch(raw, anz.cp_mask,
                                       threshold=options.threshold_cp)

    def _raw_and_evaluate(self, options) -> cand.EvaluatedBatch:
        """Raw sampling + evaluation. On the default 'adam' path this is ONE
        device dispatch (PRNG init + fused sweep + CZ counting in a single
        executable) — dispatch latency through remote-device tunnels runs to
        seconds, so stage fusion matters beyond compute."""
        if options.method != 'adam':
            raw = self._generate_raw(options)
            return self._evaluate_raw(raw, options)

        anz = self._ansatz(options)
        regloss_fn = batched_sim.make_batched_regloss(
            self.num_qubits, 'cp', options.rotation_gates, anz.placements,
            self.unitary_loss_func, cp_mask=anz.cp_mask,
            regularization_func=self.cp_regularization_func, r=options.r,
            reversible=True)
        batch_size = mesh_lib.padded_batch_size(options.num_samples, self.mesh)
        self._check_working_set(batch_size, options)
        sharding = mesh_lib.restart_sharding(self.mesh) if self.mesh else None
        return cand.run_raw_stage_fused(
            regloss_fn, options.random_seed, batch_size, anz.num_angles,
            anz.cp_mask, cp_dist=options.cp_distribution,
            threshold=options.threshold_cp,
            learning_rate=options.learning_rate,
            num_iterations=options.num_gd_iterations, sharding=sharding)

    def _check_working_set(self, batch_size: int, options=None) -> None:
        """Enforce the measured VMEM-spill/crash envelope: the fused sweep
        holds (2^n, 2^n, B) complex64 tensors; throughput degrades once one
        exceeds ~32 MB per device, a v5e worker crashes outright at ~134 MB
        (6q @ batch 4096, k=20), and at paper-scale template depth the wall
        moves in (5q @ effective batch 4096 crashed at k~50 where k=20 was
        fine) — RESULTS_r3.md §1/§18. The envelope model scales the tensor
        size linearly in k past the measured k=20 plateau; the crash wall in
        that normalized measure sits between the largest surviving point
        (6q@2048,k20 = 64 MiB) and the smallest crashing one (5q@4096,k~50
        ~= 80 MiB), so the guard trips at 75. Default: hard ValueError (a dead
        worker takes shared hardware down for hours); options.unsafe_batch
        =True restores the legacy warn-and-proceed behavior."""
        if getattr(self.unitary_loss_func, 'kind', None) == 'state':
            return  # column-only build, 2^n-fold smaller
        per_device = batch_size // (self.mesh.devices.size if self.mesh else 1)
        tensor_mb = (4 ** self.num_qubits) * per_device * 8 / 2 ** 20
        k = 20
        if options is not None:
            k = getattr(options, 'max_num_cp_gates', None) or \
                getattr(options, 'num_cp_gates', None) or 20
        eff_mb = tensor_mb * max(1.0, k / 20.0)
        if eff_mb > 75:
            msg = (
                f'batched unitary tensor is {tensor_mb:.0f} MB per device '
                f'(2^{self.num_qubits} x 2^{self.num_qubits} x '
                f'{per_device} c64; {eff_mb:.0f} MB k-scaled working set '
                f'at num_cp_gates={k}); measured to crash a v5e TPU worker '
                f'beyond ~128 MB — reduce num_samples '
                f'(throughput plateaus by ~32 MB anyway, RESULTS_r3.md)')
            if options is not None and getattr(options, 'unsafe_batch', False):
                import warnings
                warnings.warn(msg, stacklevel=3)
            else:
                raise ValueError(
                    msg + '; pass unsafe_batch=True to override at your '
                          'own risk (a crashed worker can take the shared '
                          'TPU backend down for hours)')

    def _bucketed_stage(self, options, vmapped: bool = False):
        """One jitted raw-stage executable for ALL (k, r) adaptive trials:
        template padded to max_num_cp_gates; seed, r and the active-block
        mask are runtime arguments. Cached on the instance. vmapped=True
        returns the same stage vmapped over a leading trial axis — the
        parallel_trials path evaluates N TPE suggestions in ONE dispatch."""
        batch = mesh_lib.padded_batch_size(options.num_samples, self.mesh)
        self._check_working_set(
            batch * max(1, int(getattr(options, 'parallel_trials', 1) or 1))
            if vmapped else batch, options)
        key = (options.max_num_cp_gates, options.rotation_gates, batch,
               options.num_gd_iterations, options.learning_rate,
               options.cp_distribution, options.threshold_cp, vmapped)
        cache = getattr(self, '_stage_cache', None)
        if cache is None:
            cache = self._stage_cache = {}
        if key in cache:
            return cache[key]

        anz = Ansatz(self.num_qubits, 'cp',
                     fill_layers(self.layer, options.max_num_cp_gates),
                     options.rotation_gates)
        lp_fn = batched_sim.make_batched_loss_and_penalty(
            self.num_qubits, 'cp', options.rotation_gates, anz.placements,
            self.unitary_loss_func, anz.cp_mask, self.cp_regularization_func)
        num_angles = anz.num_angles
        cp_mask_j = anz.cp_mask
        sharding = mesh_lib.restart_sharding(self.mesh) if self.mesh else None
        iters, lr = options.num_gd_iterations, options.learning_rate
        cp_dist, threshold = options.cp_distribution, options.threshold_cp

        def stage(seed, r, active, params_in, resume):
            prng = jax.random.PRNGKey(seed)
            inits = cand.generate_initial_angles_batch(
                prng, num_angles, cp_mask_j, cp_dist=cp_dist, batch_size=batch)
            inits = inits * active[None, :]
            # resume > 0: continue descent from a previous segment's best
            # parameters instead of fresh PRNG draws (num_gd_segments
            # chaining). Both branches are cheap so a select suffices.
            inits = jnp.where(resume > 0, params_in, inits)
            if sharding is not None:
                inits = jax.lax.with_sharding_constraint(inits, sharding)
            grad_mask = jnp.broadcast_to(active[:, None], (num_angles, batch))

            def regloss_fn(p):
                loss, pen = lp_fn(p)
                return loss + r * pen, loss

            best_p, _, best_loss = engine.fused_adam_sweep(
                regloss_fn, inits.T, learning_rate=lr, num_iterations=iters,
                grad_mask_pb=grad_mask)
            cz = cand.cz_value(best_p * cp_mask_j[:, None],
                               threshold=threshold).sum(axis=0).astype(jnp.int32)
            return cz, best_loss, best_p.T

        fn = (jax.jit(jax.vmap(stage, in_axes=(0, 0, 0, 0, None)))
              if vmapped else jax.jit(stage))
        cache[key] = (fn, anz)
        return cache[key]

    def _staged_run(self, options, vmapped: bool = False):
        """3-arg (seed, r, active) wrapper over the bucketed stage that
        chains ``options.num_gd_segments`` dispatches of the one compiled
        executable, feeding each segment the previous segment's best-so-far
        parameters (which stay on device between dispatches). At the default
        1 segment the call stream is identical to the pre-chaining stage —
        the determinism contract benchmarks/reverify.py relies on."""
        fn, anz = self._bucketed_stage(options, vmapped=vmapped)
        batch = mesh_lib.padded_batch_size(options.num_samples, self.mesh)
        num_angles = anz.num_angles
        segments = max(1, int(getattr(options, 'num_gd_segments', 1) or 1))

        def run(seed, r, active):
            if vmapped:
                z = jnp.zeros((np.shape(seed)[0], batch, num_angles),
                              dtype=config.real_dtype)
            else:
                z = jnp.zeros((batch, num_angles), dtype=config.real_dtype)
            cz, loss, angles = fn(seed, r, active, z, jnp.float32(0.0))
            for _ in range(segments - 1):
                cz, loss, angles = fn(seed, r, active, angles,
                                      jnp.float32(1.0))
            return cz, loss, angles

        return run, anz

    def _verify(self, anz: Ansatz, angles_batch: np.ndarray,
                options: BasicOptions) -> cand.VerifiedBatch:
        # only BasicOptions fields are read, so static AND adaptive options
        # objects are both accepted directly (no synthetic StaticOptions with
        # placeholder required fields).
        # pad the candidate count to buckets of 8 (repeating a row) so the
        # verification executable compiles for few distinct shapes
        angles_batch = np.asarray(angles_batch)
        c = len(angles_batch)
        cb = max(8, ((c + 7) // 8) * 8)
        if cb > c:
            pad = np.repeat(angles_batch[:1], cb - c, axis=0)
            angles_batch = np.concatenate([angles_batch, pad], axis=0)
        ver = cand.verify_candidates_batch(
            self.unitary_loss_func, anz.unitary, angles_batch, anz.cp_mask,
            threshold_cp=options.threshold_cp,
            method=options.method,
            learning_rate=options.learning_rate_at_verification,
            num_iterations=options.num_gd_iterations_at_verification,
            target_loss=options.target_loss, anz=anz,
            num_segments=max(1, int(getattr(options, 'num_gd_segments', 1)
                                    or 1)))
        if cb > c:
            ver = cand.VerifiedBatch(*(np.asarray(f)[:c] for f in ver))
        return ver

    def _initialize_results(self, save_results, save_to) -> Results:
        results = Results(self.unitary_loss_func, self.layer, label=self.label)
        if save_results:
            assert self.label or save_to, \
                'To save results on disk either `label` or `save_to` must be ' \
                'provided. If you insist on not saving the results call the ' \
                'decomposition routine with `save_results=False` flag.'
            if save_to:
                results.save_to = save_to
            try:
                results = Results.load(results.save_to)
            except FileNotFoundError:
                pass
        return results

    def _make_decomposition(self, anz: Ansatz, best_angles,
                            static_options=None, adaptive_options=None
                            ) -> Decomposition:
        d = Decomposition._from_cp_circuit(self.unitary_loss_func, anz,
                                           best_angles, self.label)
        d._static_options = static_options
        d._adaptive_options = adaptive_options
        d._decomposer = self
        return d

    # -- static -------------------------------------------------------------

    def static(self, options: StaticOptions, save_results=True, save_to='',
               verbose=True) -> Results:
        """Fixed-template synthesis (reference main.py:637-693)."""
        def log(msg):
            if verbose:
                print(msg, flush=True)

        results = self._initialize_results(save_results, save_to)
        log(f'\nSynthesis run starting; options:\n{options}')

        log('\nRunning the multi-start sampling stage...')
        ev = self._raw_and_evaluate(options)

        log('\nFiltering candidates against the entry thresholds...')
        prospective = cand.filter_prospective(
            ev, threshold_cz_count=options.accepted_num_cz_gates,
            threshold_loss=options.entry_loss)

        successful: List[Decomposition] = []
        if len(prospective):
            log(f'\n{len(prospective)} candidates pass; verifying...')
            anz = self._ansatz(options)
            ver = self._verify(anz, ev.angles[prospective], options)
            for pos in range(len(prospective)):
                if ver.success[pos]:
                    d = self._make_decomposition(anz, ver.best_angles[pos],
                                                 static_options=options)
                    successful.append(d)
            if successful:
                log(f'\n{len(successful)} verified; CZ counts:')
                log(sorted([d.cz_count for d in successful]))
                results.decompositions = list(results.decompositions) + successful
                if save_results:
                    results.save()
            else:
                log('\nNo candidate survived verification.')
        else:
            log('\nNo candidates passed the entry thresholds.')

        return results

    # -- adaptive -------------------------------------------------------------

    def adaptive(self, options: AdaptiveOptions, save_results=True,
                 save_to='', verbose=True) -> Results:
        """TPE-adaptive synthesis over (num_cp_gates, r)
        (reference main.py:695-864)."""
        def log(msg):
            if verbose:
                print(msg, flush=True)

        log(f'\nSynthesis run starting; options:\n{options}')

        space = [
            tpe.QUniformInt('num_cp_gates', options.min_num_cp_gates,
                            options.max_num_cp_gates, 1),
            tpe.LogNormal('r', math.log(options.r_mean), options.r_variance),
        ]

        results = self._initialize_results(save_results, save_to)
        if results.trials is not None:
            log('\nExisting trials found on disk - resuming.')
            trials = results.trials
            random_seed = trials.results[-1]['random_seed']
            num_existing = len(trials.results)
        else:
            trials = tpe.Trials()
            random_seed = options.random_seed
            num_existing = 0

        if results.decompositions:
            scoreboard = sorted(set(d.cz_count for d in results.decompositions))
        else:
            scoreboard = [losses.theoretical_lower_bound(self.num_qubits)]

        if num_existing >= options.max_evals:
            log('Evaluation budget already exhausted.')

        def result_from_ev(ev, random_seed, num_cp_gates, r):
            prospective = cand.filter_prospective(
                ev, threshold_cz_count=float('inf'),
                threshold_loss=options.entry_loss)
            cz_counts = [int(ev.cz[i]) for i in prospective]

            # score: soft-min of cz counts, normalized per sample, log scale
            # (reference main.py:735-737). Normalize by num_samples, NOT the
            # mesh-padded batch: trials persist via Results.save and may be
            # resumed on a machine with a different device count, and TPE's
            # good/bad split must score both halves on the same scale.
            score_val = np.sum(2.0 ** (-np.array(cz_counts, dtype=np.float64)))
            with np.errstate(divide='ignore'):
                score = float(np.log2(score_val / options.num_samples))
            min_raw_loss = float(np.nanmin(ev.loss)) if np.size(ev.loss) \
                else float('inf')
            if not cz_counts:
                # Graded fallback for hard targets (RESULTS_r4 section 11):
                # with zero prospectives the reference-shaped score is
                # log2(0) = +inf and EVERY such trial ties, so TPE gets no
                # signal at all — 270/270 toffoli-6 trials were +inf across
                # rounds 2-4. Rank empty trials by how close the best
                # sample in the batch got instead. The 1000 offset keeps
                # any empty trial strictly worse than any trial with a
                # prospective (real scores are <= max_cz + log2(N) ~ 100),
                # and 10*log10(min batch loss) in [-120, 0] preserves a
                # monotone posterior over (k, r) below the offset.
                score = -(1000.0 + 10.0 * math.log10(
                    max(min_raw_loss, 1e-12))) \
                    if math.isfinite(min_raw_loss) else -float('inf')

            log(f'score: {-score}, cz counts of prospective results: {cz_counts}')

            return_dict = {
                'loss': -score,
                'status': 'ok',
                'random_seed': random_seed,
                'cz_counts': cz_counts,
                'min_raw_loss': min_raw_loss,
                'num_cp_gates': num_cp_gates,
                'r': r,
                'layer': self.layer,
                'prospective_decompositions':
                    [[int(ev.cz[i]), ev.angles[i]] for i in prospective],
            }
            if options.keep_logs:
                # per-trial attachments parity (reference main.py:751-756):
                # dill payloads of the prospectives, the trial's realized
                # static options and the loss spec travel with the trial
                return_dict['attachments'] = {
                    'prospective_decompositions':
                        dill.dumps(return_dict['prospective_decompositions']),
                    'static_options':
                        dill.dumps(options.get_static(num_cp_gates, r)),
                    'unitary_loss_func': dill.dumps(self.unitary_loss_func)}
            return return_dict

        def objective(random_seed, search_params):
            num_cp_gates, r = int(search_params[0]), float(search_params[1])
            log(f'\nnum_cp_gates: {num_cp_gates}, r: {r}')
            static_options = options.get_static(num_cp_gates, r)
            static_options.random_seed = random_seed

            if options.bucketed:
                # one executable for every (k, r): tail blocks of the padded
                # template frozen at identity via the runtime active mask
                stage, anz_max = self._staged_run(options)
                p_k = 3 * self.num_qubits + num_cp_gates * anz_max.num_block_angles
                active = np.zeros(anz_max.num_angles, dtype=np.float32)
                active[:p_k] = 1.0
                cz, loss, angles = stage(
                    jnp.asarray(random_seed, dtype=jnp.uint32),
                    jnp.float32(r), jnp.asarray(active))
                ev = cand.EvaluatedBatch(cz=np.asarray(cz),
                                         loss=np.asarray(loss),
                                         angles=np.asarray(angles)[:, :p_k])
            else:
                ev = self._raw_and_evaluate(static_options)
            return result_from_ev(ev, random_seed, num_cp_gates, r)

        def objective_parallel(suggestions):
            """Evaluate several (seed, (k, r)) suggestions in ONE device
            dispatch via the vmapped bucketed stage; one result dict each
            (same schema as objective)."""
            stage, anz_max = self._staged_run(options, vmapped=True)
            n = len(suggestions)
            seeds = jnp.asarray([s for s, _ in suggestions], dtype=jnp.uint32)
            rs = jnp.asarray([float(v[1]) for _, v in suggestions],
                             dtype=jnp.float32)
            actives = np.zeros((n, anz_max.num_angles), dtype=np.float32)
            p_ks = []
            for j, (_, v) in enumerate(suggestions):
                p_k = 3 * self.num_qubits + \
                    int(v[0]) * anz_max.num_block_angles
                actives[j, :p_k] = 1.0
                p_ks.append(p_k)
            czs, lss, angs = stage(seeds, rs, jnp.asarray(actives))
            czs, lss, angs = (np.asarray(czs), np.asarray(lss),
                              np.asarray(angs))
            out = []
            for j, (seed_j, v) in enumerate(suggestions):
                num_cp_gates, r = int(v[0]), float(v[1])
                log(f'\nnum_cp_gates: {num_cp_gates}, r: {r}')
                ev = cand.EvaluatedBatch(cz=czs[j], loss=lss[j],
                                         angles=angs[j][:, :p_ks[j]])
                out.append(result_from_ev(ev, seed_j, num_cp_gates, r))
            return out

        n_par = max(1, int(getattr(options, 'parallel_trials', 1) or 1))
        pbar = None
        if verbose:
            try:  # progress bar over evaluations (reference main.py:793)
                from tqdm.auto import tqdm
                pbar = tqdm(desc='Evaluations', initial=num_existing,
                            total=options.max_evals)
            except ImportError:
                pass
        i = num_existing
        stop = False
        while i < options.max_evals and not stop:
            step = min(n_par, options.max_evals - i)
            log('\n' + '-' * 42)
            log(f'iteration {i}/{options.max_evals}'
                + (f' ({step} parallel trials)' if step > 1 else ''))

            # draw `step` suggestions; the seed chain evolves sequentially
            # (reference main.py:798-799) so the trial stream is identical
            # to the sequential mode's and resume works unchanged
            suggestions = []
            if step > 1:
                # constant-liar: later suggestions see provisional results
                # at the mean observed score, keeping the batch diverse
                lie_trials = tpe.Trials()
                lie_trials.vals = list(trials.vals)
                lie_trials.results = list(trials.results)
                lie = (float(np.mean([res['loss']
                                      for res in trials.results]))
                       if trials.results else 0.0)
            for _ in range(step):
                _, subkey = jax.random.split(jax.random.PRNGKey(random_seed))
                random_seed = int(subkey[1])
                rng = np.random.default_rng(random_seed)
                src = trials if step == 1 else lie_trials
                values = tpe.suggest(space, src, rng)
                if step > 1:
                    lie_trials.record(values, {
                        'loss': lie, 'status': 'ok',
                        'num_cp_gates': int(values[0]),
                        'r': float(values[1]),
                        'random_seed': random_seed, 'cz_counts': []})
                suggestions.append((random_seed, values))

            if step == 1:
                outcomes = [objective(*suggestions[0])]
            else:
                outcomes = objective_parallel(suggestions)

            for (seed_j, values_j), result in zip(suggestions, outcomes):
                trials.record(values_j, result)
                results.trials = trials
                if save_results:
                    results.save()

                current_best_cz = scoreboard[0]
                last = trials.results[-1]
                num_cp_gates, r = last['num_cp_gates'], last['r']
                prospect_list = last['prospective_decompositions']
                if not options.keep_logs:
                    last.pop('prospective_decompositions')

                to_verify = [[cz, angles] for cz, angles in prospect_list
                             if cz < current_best_cz]
                if to_verify:
                    log(f'\n{len(to_verify)} candidates beat the current '
                        f'best CZ count {current_best_cz}; verifying...')
                else:
                    log(f'\nNo candidate beats the current best CZ count '
                        f'{current_best_cz}.')

                if to_verify:
                    anz = self._ansatz(options.get_static(num_cp_gates, r))
                    angles_batch = np.stack([a for _, a in to_verify])
                    ver = self._verify(anz, angles_batch, options)
                    found = False
                    for pos in range(len(to_verify)):
                        if ver.success[pos]:
                            num_cz = int(ver.cz[pos])
                            log(f'\nNew verified decomposition: '
                                f'{num_cz} CZ gates.')
                            scoreboard.insert(0, num_cz)
                            d = self._make_decomposition(
                                anz, ver.best_angles[pos],
                                adaptive_options=options,
                                static_options=options.get_static(
                                    num_cp_gates, r))
                            results.decompositions = \
                                list(results.decompositions) + [d]
                            if save_results:
                                results.save()
                            found = True
                            break
                    if not found:
                        log('\nNone of the candidates survived '
                            'verification.')

                if options.stop_if_target_reached and \
                        scoreboard[0] <= options.target_num_cz_gates:
                    log('\nTarget CZ count reached - stopping early.')
                    stop = True
                    break

            i += step
            if pbar is not None:
                pbar.update(step)
        if pbar is not None:
            pbar.close()

        return results
