"""benchmarks.configs must propagate failures as a nonzero exit code.

VERDICT r4 weak-5: ghz7/ghz8 hit "TPU backend error (FailedPrecondition)"
and the queue log recorded `done rc=0` — `benchmarks.configs` printed an
error JSON but exited 0, so queue post-mortems misread dead-tunnel no-ops
as completed segments. This pins the contract: any config whose run ends
in an {'error': ...} row (or an unknown config name) exits 1; a clean run
exits 0.
"""

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*argv, extra_env=None):
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               CPFLOW_FORCE_CPU='1', **(extra_env or {}))
    return subprocess.run([sys.executable, '-m', 'benchmarks.configs',
                           *argv], capture_output=True, text=True,
                          cwd=_REPO, env=env, timeout=600)


def test_unknown_config_exits_nonzero():
    r = _run('no_such_config_xyz')
    assert r.returncode == 1, r.stdout + r.stderr
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.strip()]
    assert any('error' in row for row in rows)


def test_failing_config_exits_nonzero(monkeypatch):
    # drive a real config into its error path hermetically: readme_ccz with
    # an env that makes the backend init fail is not reproducible on CPU,
    # so exercise main() in-process with a stubbed failing config instead.
    import benchmarks.configs as C

    def boom():
        raise RuntimeError('TPU backend error (FailedPrecondition)')

    monkeypatch.setitem(C.ALL, 'stub_fail', boom)
    monkeypatch.setattr(C.sys, 'argv', ['configs', 'stub_fail'])
    monkeypatch.setattr(C, '_run_with_retry',
                        lambda fn, name, **kw: {'config': name,
                                                'error': 'boom'})
    try:
        C.main()
    except SystemExit as e:
        assert e.code == 1
    else:
        raise AssertionError('main() did not exit nonzero on error row')
