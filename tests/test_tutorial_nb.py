"""Execute the tutorial notebook end-to-end (ROADMAP engineering item;
the reference's tutorial doubles as its integration test, SURVEY.md §4).

The notebook is executed in a fresh kernel with a prepended cell pinning
jax to CPU (the ambient sitecustomize pins the axon TPU tunnel; env vars
alone don't override it — CLAUDE.md). Workload sizes inside the notebook
are already smoke-sized. Marked slow: run the quick tier with
`pytest -m "not slow"`.
"""

import os

import nbformat
import pytest

_NB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'tutorial', 'cpflow_tpu_tutorial.ipynb')

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PIN_CPU = f"""\
import sys
sys.path.insert(0, {_REPO!r})
import jax
jax.config.update('jax_platforms', 'cpu')
"""


@pytest.mark.slow
def test_tutorial_notebook_executes():
    from nbclient import NotebookClient

    nb = nbformat.read(_NB, as_version=4)
    nbformat.validate(nb)
    nb.cells.insert(0, nbformat.v4.new_code_cell(_PIN_CPU))
    client = NotebookClient(nb, timeout=900, kernel_name='python3',
                            resources={'metadata': {'path': os.path.dirname(_NB)}})
    client.execute()  # raises CellExecutionError on any failing cell

    executed = [c for c in nb.cells if c.cell_type == 'code']
    assert all(c.execution_count is not None for c in executed)
