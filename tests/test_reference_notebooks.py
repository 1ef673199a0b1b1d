"""Execute the REFERENCE's own notebooks against the cpflow shim.

The reference has no test suite; its notebooks are its integration tests
(SURVEY.md §4). tests/test_tutorial_nb.py executes OUR tutorial; this module
executes the reference's:

  * tutorial/CPFlow_tutorial.ipynb — a patched copy runs in a fresh Jupyter
    kernel (same harness as test_tutorial_nb): `from cpflow import *`
    resolves to the TPU implementation through the shim, qiskit is replaced
    by a minimal stub (the notebook only uses it to BUILD TARGETS —
    tests/_nbstubs.py), shell magics are stripped, the wget'd stored
    results are the local copies of the same files (loaded through the
    migration loader), and search budgets are smoke-shrunk (patch table
    below). A final appended cell asserts the notebook's key outcomes.
  * paper/peppar.ipynb cells 45-46 — the `benchmark_circuit.check_cpflow()`
    validator: every stored benchmark decomposition must compile its
    target .qasm unitary below 1e-6 and respect the chain topology where
    claimed (BASELINE.json: "peppar.ipynb reruns unchanged").

Slow tier (minutes of CPU synthesis).
"""

import json
import os

import pytest

pytestmark = pytest.mark.slow

_REF = '/root/reference'
_TUTORIAL_NB = os.path.join(_REF, 'tutorial', 'CPFlow_tutorial.ipynb')
_PEPPAR_NB = os.path.join(_REF, 'paper', 'peppar.ipynb')
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_reference = pytest.mark.skipif(
    not os.path.exists(_TUTORIAL_NB), reason='reference repo not available')


# (code-cell-index, old, new) source patches: budget shrink + local results.
# The wget cells fetch the notebook's precomputed results from the upstream
# repo; the identical files ship with the reference checkout, so the copy
# happens exactly where the wget did (NOT earlier: the static cells before
# it must save/load their own fresh Results files at the same paths).
_COPY_TOFF4 = ("import shutil\n"
               f"shutil.copy({_REF!r} + '/tutorial/results/toff4_star', "
               "'results/toff4_star')\n")
_COPY_TOFF3 = ("import shutil\n"
               f"shutil.copy({_REF!r} + '/tutorial/results/toff3_chain', "
               "'results/toff3_chain')\n")
_TUTORIAL_PATCHES = {
    15: [('num_samples=500', 'num_samples=128'),
         ('max_evals=5', 'max_evals=3')],
    18: [('options.max_evals = 50', 'options.max_evals = 3')],
    # the 3-eval smoke budget may legitimately find nothing on this 4q
    # workload (the paper spent ~100 evals); fall back to the stored
    # results cell 19 loads anyway so the notebook's flow continues
    17: [('d = results.decompositions[-1]',
          'if not results.decompositions:\n'
          '    ' + _COPY_TOFF4.replace('\n', '\n    ')
          + "results = Results.load('results/toff4_star')\n"
          'd = results.decompositions[-1]')],
    19: [("results = Results.load('results/toff4_star')",
          _COPY_TOFF4 + "results = Results.load('results/toff4_star')")],
    # GHZ / relative-toffoli adaptive cells use default budgets (100x100);
    # stop_if_target_reached bounds them, but shrink for the CPU tier
    26: [('options = AdaptiveOptions(\n',
          'options = AdaptiveOptions(\n'
          '    num_samples=64,\n    max_evals=8,\n')],
    29: [('options = AdaptiveOptions(\n',
          'options = AdaptiveOptions(\n'
          '    num_samples=64,\n    max_evals=8,\n')],
    32: [("results = Results.load('results/toff3_chain')",
          _COPY_TOFF3 + "results = Results.load('results/toff3_chain')")],
}

_SKIP_CELLS = {0, 1, 40}  # pip/rustc install cells, version-print cell

_PRELUDE = f"""\
import sys
sys.path.insert(0, {_REPO!r})
sys.path.insert(0, {os.path.join(_REPO, 'tests')!r})
import jax
jax.config.update('jax_platforms', 'cpu')
import matplotlib
matplotlib.use('Agg')
import _nbstubs
_nbstubs.install()
import os, tempfile
os.chdir(tempfile.mkdtemp())
os.makedirs('results', exist_ok=True)
"""

_EPILOGUE = """\
# appended by tests/test_reference_notebooks.py: the notebook's key outcomes
assert len(results.decompositions) > 0
# cells 111-118 loaded the stored toff3_chain results through migration:
# the best stored decomposition is the published 8-CZ chain Toffoli
assert min(d.cz_count for d in results.decompositions) == 8
assert len(results_reproduced.decompositions) > 0
print('REFERENCE TUTORIAL OK')
"""


def _strip_magics(src):
    return '\n'.join(line for line in src.split('\n')
                     if not line.lstrip().startswith(('!', '%')))


@needs_reference
def test_reference_tutorial_executes(tmp_path):
    import nbformat
    from nbclient import NotebookClient

    nb = nbformat.read(_TUTORIAL_NB, as_version=4)
    code_idx = -1
    kept = []
    for cell in nb.cells:
        if cell.cell_type != 'code':
            continue
        code_idx += 1
        if code_idx in _SKIP_CELLS:
            continue
        src = _strip_magics(cell.source)
        for old, new in _TUTORIAL_PATCHES.get(code_idx, []):
            assert old in src, (code_idx, old)
            src = src.replace(old, new)
        cell.source = src
        kept.append(cell)
    assert code_idx == 40  # layout pinned; revisit patches if this moves

    out = nbformat.v4.new_notebook()
    out.cells = ([nbformat.v4.new_code_cell(_PRELUDE)] + kept
                 + [nbformat.v4.new_code_cell(_EPILOGUE)])
    path = tmp_path / 'reference_tutorial_patched.ipynb'
    nbformat.write(out, str(path))

    client = NotebookClient(nbformat.read(str(path), as_version=4),
                            timeout=1800, kernel_name='python3')
    client.execute()  # raises CellExecutionError on any failing cell


@needs_reference
def test_peppar_check_cpflow_validator():
    """Execute the reference's benchmark validator cells verbatim (modulo
    absolute paths), with the notebook's earlier-cell namespace provided by
    the shim: every stored benchmark decomposition compiles its .qasm
    target below 1e-6 and chain-topology rows respect the topology."""
    import jax
    jax.config.update('jax_platforms', 'cpu')

    cells = [''.join(c['source']) for c in json.load(open(_PEPPAR_NB))['cells']
             if c['cell_type'] == 'code']
    src45, src46 = cells[45], cells[46]
    assert 'check_cpflow' in src45 and 'benchmark_circuits' in src46

    # namespace the notebook built in earlier cells (cell 1 imports et al.)
    from dataclasses import dataclass
    from pandas import DataFrame
    from cpflow import Results
    from cpflow.matrix_utils import cost_HST
    from cpflow.topology import chain_layer
    from cpflow_tpu.circuits.ir import Circuit

    class QuantumCircuit:
        @staticmethod
        def from_qasm_file(path):
            return Circuit.from_qasm_file(path)

    class Operator:
        def __init__(self, qc):
            self.data = qc.unitary()

    def get_placements(circuit):
        # reference peppar cell 1, against our IR
        return [list(inst.qubits) for inst in circuit.instructions
                if inst.name == 'cz']

    ns = {
        'dataclass': dataclass, 'DataFrame': DataFrame,
        'Results': Results, 'cost_HST': cost_HST,
        'chain_layer': chain_layer, 'QuantumCircuit': QuantumCircuit,
        'Operator': Operator, 'get_placements': get_placements,
    }

    # absolute paths instead of the notebook's repo-relative ones
    src45 = src45.replace("'results/benchmarks/",
                          f"'{_REF}/paper/results/benchmarks/")
    src45 = src45.replace("f'results/benchmarks/",
                          f"f'{_REF}/paper/results/benchmarks/")
    src45 = src45.replace("f'benchmark_circuits/",
                          f"f'{_REF}/paper/benchmark_circuits/")
    exec(compile(src45, '<peppar cell 45>', 'exec'), ns)

    # cell 46 prints failures instead of raising; capture and assert none
    failures = []
    for bc in ns['benchmark_circuits']:
        try:
            bc.check_cpflow()
        except (AssertionError, ValueError) as e:
            failures.append((bc.name, bc.label, str(e)))
    assert not failures, failures
    # validated CZ counts got assigned — and match the paper's Table 4
    counts = {(bc.name, bc.label): bc.cpflow
              for bc in ns['benchmark_circuits']}
    assert counts[('alu-v3_34', 't1')] == 14
    assert counts[('4gt13_92', 't1')] == 17
    assert all(c > 0 for c in counts.values())
