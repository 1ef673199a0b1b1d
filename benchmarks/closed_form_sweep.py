"""Run closed_form_search over every committed artifact (except the ones
already resolved/characterized) and emit one JSON line per row. Rows with
gauge-free reductions identify in one Gauss-Newton round (qx_alu-v3_34
did); gauge-heavy rows stop at the DFS budget. Host CPU only.

Usage: python -m benchmarks.closed_form_sweep [label ...]
"""
import glob, json, os, sys, time

from benchmarks.closed_form_search import search, DYNAMIC_POLY

_ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'artifacts')
SKIP = {'relphase_toff4_connected', 'relphase_toff4_chain',
        'relphase_toff5_connected', 'qx_alu-v3_34', 'qx_4gt13_92',
        'exact_proofs', 'closed_forms'}


def main():
    labels = sys.argv[1:] or sorted(
        os.path.basename(p)[:-5]
        for p in glob.glob(os.path.join(_ART, '*.json'))
        if os.path.basename(p)[:-5] not in SKIP)
    budget = int(os.environ.get('CPFLOW_CFS_BUDGET', 500))
    for label in labels:
        t0 = time.time()
        try:
            res = search(label, verbose=False, budget=budget)
            row = {'label': label, 'n_angles': res['n_angles'],
                   'unidentified': len(res['unidentified']),
                   'specs': res['specs'] if not res['unidentified'] else None,
                   'mp_loss': res['mp_loss_50dig'],
                   'minted': dict(DYNAMIC_POLY)}
        except Exception as e:  # noqa: BLE001 — sweep must not abort
            import traceback
            row = {'label': label, 'error': f'{type(e).__name__}: {e}',
                   'traceback': traceback.format_exc().splitlines()[-6:]}
        row['wall_s'] = round(time.time() - t0, 1)
        row['squeeze'] = bool(os.environ.get('CPFLOW_CFS_SQUEEZE'))
        row['budget'] = budget
        print(json.dumps(row), flush=True)
        # Durable record (the r5 VM reset ate /tmp sweep logs): fully
        # identified rows feed exact_proofs.prove_from_closed_form.
        store = os.path.join(_ART, 'closed_forms.json')
        data = json.load(open(store)) if os.path.exists(store) else {}
        prev = data.get(label)
        # never clobber a fully identified record with a worse rerun
        if not (prev and prev.get('specs') and not row.get('specs')):
            data[label] = row
            # atomic write: a timeout kill mid-dump must never truncate
            # the shared ledger (same discipline as exact_proofs.main)
            tmp = store + '.tmp'
            with open(tmp, 'w') as f:
                json.dump(data, f, indent=1, sort_keys=True)
            os.replace(tmp, store)


if __name__ == '__main__':
    main()
