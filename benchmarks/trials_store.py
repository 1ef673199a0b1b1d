"""Committed, compact TPE-trial summaries for cross-round hunt resume.

benchmarks/results/ (the dill Results pickles the reference contract
persists, reference main.py:459-469) is gitignored, so long beat hunts
lose their TPE search state whenever the working tree is rebuilt. This
module round-trips the part of that state the adaptive loop actually
needs — the trial stream (vals + loss/num_cp_gates/r/random_seed/
cz_counts per trial; api.adaptive resumes the seed chain from
trials.results[-1]['random_seed'] and TPE reads vals + losses) — through
small committed JSON files under benchmarks/trial_summaries/.

Decompositions are NOT stored here: every claimed circuit already lives
in benchmarks/artifacts/ with its exact unitary check. A summary-seeded
resume therefore starts with an empty scoreboard but the full TPE
posterior, which is what makes a resumed hunt smarter than a cold one.

Usage:
    python -m benchmarks.trials_store export-all   # after a hunt session
    (seeding happens automatically in benchmarks.configs._adaptive_run)
"""

from __future__ import annotations

import glob
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS_DIR = os.path.join(_HERE, 'results')
SUMMARY_DIR = os.path.join(_HERE, 'trial_summaries')

# the per-trial keys the adaptive loop reads back (api.py result_from_ev
# schema minus the non-serializable prospective_decompositions);
# min_raw_loss (r4, RESULTS_r4 section 11) is optional for old summaries
_KEYS = ('loss', 'status', 'num_cp_gates', 'r', 'random_seed', 'cz_counts',
         'min_raw_loss')


def summary_path(label: str) -> str:
    return os.path.join(SUMMARY_DIR, f'{label}.json')


def export_summary(results, label: str) -> str | None:
    """Write the committed JSON summary of a Results' trials."""
    if results.trials is None or not results.trials.results:
        return None
    rows = []
    for vals, res in zip(results.trials.vals, results.trials.results):
        row = {k: res[k] for k in _KEYS if k in res}
        row['vals'] = [float(v) for v in vals]
        if 'cz_counts' in row:
            row['cz_counts'] = [int(c) for c in row['cz_counts']]
        rows.append(row)
    os.makedirs(SUMMARY_DIR, exist_ok=True)
    path = summary_path(label)
    with open(path, 'w') as f:
        json.dump({'label': label, 'n_trials': len(rows), 'trials': rows},
                  f, separators=(',', ':'))
    return path


def load_summary_trials(label: str):
    """Reconstruct a tpe.Trials from the committed summary, or None."""
    path = summary_path(label)
    if not os.path.exists(path):
        return None
    from cpflow_tpu.search import tpe
    with open(path) as f:
        data = json.load(f)
    trials = tpe.Trials()
    for row in data['trials']:
        vals = row.pop('vals')
        trials.record(vals, row)
    return trials


def seed_results_file(save_to: str, label: str, loss_function, layer) -> bool:
    """If no dill Results exists at save_to but a committed summary does,
    materialize a Results pickle seeded with the summary's trials so
    api.adaptive resumes the TPE search instead of starting cold.

    Returns True when a seed file was written."""
    if os.path.exists(save_to):
        return False
    trials = load_summary_trials(label)
    if trials is None:
        return False
    from cpflow_tpu.api import Results
    results = Results(loss_function, layer, label=label, save_to=save_to)
    results.trials = trials
    results.save()
    return True


def export_all() -> list:
    """Export summaries for every Results pickle under benchmarks/results/."""
    from cpflow_tpu.api import Results
    written = []
    for path in sorted(glob.glob(os.path.join(RESULTS_DIR, '*'))):
        if not os.path.isfile(path) or path.endswith('.json'):
            continue
        label = os.path.basename(path)
        try:
            results = Results.load(path)
        except Exception as e:  # unreadable pickle: skip, keep going
            print(f'skip {label}: {type(e).__name__}: {e}', file=sys.stderr)
            continue
        out = export_summary(results, label)
        if out:
            written.append(out)
            print(f'{label}: {len(results.trials.results)} trials -> {out}')
    return written


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'export-all':
        import jax
        jax.config.update('jax_platforms', 'cpu')
        export_all()
    else:
        print(__doc__)
