"""Export the composite constructions (toffoli-5 chain/connected,
toffoli-6 connected) as committed artifacts alongside the per-search ones:
rebuilds each from the stored blocks, polishes, and writes
benchmarks/artifacts/<name>.json + its target into targets.npz so
tests/test_artifacts.py re-verifies them from the repo alone.

Usage: python -m benchmarks.export_composites
"""

from __future__ import annotations

import json
import os

import numpy as np

from benchmarks import composite as C

_ARTIFACTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'artifacts')


def main():
    from cpflow_tpu.ops.gates import (multi_controlled_sqrt_x,
                                      multi_controlled_x, u_toff5)

    rows = C.main()  # builds + polishes + prints each composite
    targets = {'toffoli5_chain_composite': u_toff5,
               'toffoli5_connected_composite': u_toff5,
               'toffoli6_connected_composite': multi_controlled_x(6),
               'relphase_toff6_composite': multi_controlled_x(6),
               'c5sqrtx_connected_composite': multi_controlled_sqrt_x(6),
               'toffoli7_connected_composite': multi_controlled_x(7)}
    loss_kinds = {'relphase_toff6_composite': 'modulo_diagonal'}
    os.makedirs(_ARTIFACTS, exist_ok=True)
    tpath = os.path.join(_ARTIFACTS, 'targets.npz')
    tdict = dict(np.load(tpath)) if os.path.exists(tpath) else {}

    for row in rows:
        name = row['config']
        # rebuild from the (polished) stored blocks and flatten cp/cx to
        # cz+1q; block polish already puts the assembly at e-8..e-10
        builder = {'toffoli5_chain_composite': C.build_toffoli5_chain,
                   'toffoli5_connected_composite': C.build_toffoli5_connected,
                   'toffoli6_connected_composite': C.build_toffoli6_connected,
                   'relphase_toff6_composite': C.build_relphase_toff6_composite,
                   'c5sqrtx_connected_composite': C.build_c5sqrtx_connected,
                   'toffoli7_connected_composite': C.build_toffoli7_connected
                   }[name]
        qc, _ = builder()
        n_cz, flatqc = C.cz_count_exact(qc)
        insts = [{'name': i.name, 'qubits': list(i.qubits),
                  **({'param': float(i.param)} if i.param is not None else {})}
                 for i in flatqc.instructions]
        kind = loss_kinds.get(name, 'hst')
        meta = {'label': name, 'cz_count': int(n_cz),
                'cz_depth': int(flatqc.gates_depth(['cz'])),
                'loss': row['loss_vs_toffoli5'], 'loss_kind': kind,
                'num_qubits': flatqc.num_qubits, 'instructions': insts}
        if kind == 'modulo_diagonal':
            meta['wires'] = list(range(flatqc.num_qubits))
        with open(os.path.join(_ARTIFACTS, f'{name}.json'), 'w') as f:
            json.dump(meta, f, indent=1)
        tdict[name] = targets[name].astype(np.complex64)
        print(json.dumps({'exported': name, 'cz': int(n_cz)}), flush=True)
    np.savez_compressed(tpath, **tdict)


if __name__ == '__main__':
    main()
