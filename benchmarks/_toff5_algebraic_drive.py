"""Driver: algebraic closure of the relphase toffoli-5 closed form.
Gauge-fix the 4-dim family with rational pins, mp-refine the isolated
solution to 160 digits, then find certified minimal polynomials of the
remaining angles' tangents."""
import numpy as np
from fractions import Fraction
import math, json
from benchmarks.closed_form_search import (reduced_artifact, residual_fn,
    compile_resid, gauss_newton, null_space_report, identify, spec_value,
    mp_refine, format_spec)
import jax.numpy as jnp
import jax

label='relphase_toff5_connected'
qc, meta, target = reduced_artifact(label)
meta['label'] = label
resid, n_par, d = residual_fn(qc, target, meta['loss_kind'])
fns = compile_resid(resid)
params = np.array(qc.parameters, float)
params, loss = gauss_newton(fns, params, free_idx=list(range(n_par)), iters=30)
rep = null_space_report(fns, params, [None]*n_par)
specs = [None]*n_par
for i in rep['rigid']:
    s = identify(params[i])
    if s: specs[i] = s; params[i] = spec_value(s)
print('rigid committed:', sum(x is not None for x in specs), flush=True)

# gauge-fix: pin highest-participation free coords at nearest den<=24 rational
while True:
    rep = null_space_report(fns, params, specs)
    print('gauge dim:', rep['null_dim'], flush=True)
    if rep['null_dim'] == 0:
        break
    order = sorted(rep['gauge'], key=lambda i: -rep['participation'][i])
    pinned = False
    cands = []
    for i in order:
        for den in (1, 2, 3, 4, 6, 8):
            fr = Fraction(round(params[i]/math.pi*den), den)
            dist = abs(params[i] - math.pi*float(fr))
            if dist < 0.45:
                cands.append((dist, i, fr))
    cands.sort()
    for dist, i, fr in cands:
        trial = params.copy(); trial[i] = math.pi*float(fr)
        restf = [j for j in range(n_par) if specs[j] is None and j != i]
        trial, l2 = gauss_newton(fns, trial, restf, iters=25)
        if l2/d < 1e-24:
            specs[i] = format_spec(fr, 0); params = trial
            params[i] = math.pi*float(fr)
            print(f'gauge pin a{i} = {specs[i]} (loss {l2/d:.2e})', flush=True)
            pinned = True
            break
    assert pinned, 'no gauge pin landed'

print('specs:', specs, flush=True)
theta = mp_refine(qc, meta, specs, params, dps=160, verbose=True)

from mpmath import mp, findpoly, tan, pslq
mp.dps = 160
out = {}
for i in range(n_par):
    if specs[i] is not None:
        continue
    t = tan(theta[i])
    got = None
    for deg in (2, 3, 4, 6, 8, 10, 12):
        p = findpoly(t, deg, maxcoeff=10**7, tol=mp.mpf(10)**-120)
        if p is not None:
            got = (deg, [int(c) for c in p])
            break
    out[i] = {'angle': mp.nstr(theta[i], 30), 'tan_poly': got}
    print(f'a{i}: {mp.nstr(theta[i], 25)} poly={got}', flush=True)
print(json.dumps({str(k): v for k, v in out.items()}))
