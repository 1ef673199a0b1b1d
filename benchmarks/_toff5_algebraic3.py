"""Phase 3: gauge-pin the five troublesome coordinates themselves."""
import numpy as np, math, json
from fractions import Fraction
from benchmarks.closed_form_search import (reduced_artifact, residual_fn,
    compile_resid, gauss_newton, null_space_report, identify, spec_value,
    mp_refine, format_spec)

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

PREFER = [15, 16, 18, 19, 20]
while True:
    rep = null_space_report(fns, params, specs)
    if rep['null_dim'] == 0: break
    order = [i for i in PREFER if i in rep['gauge']] + \
            sorted((i for i in rep['gauge'] if i not in PREFER),
                   key=lambda i: -rep['participation'][i])
    cands = []
    for rank, i in enumerate(order):
        for den in (1,2,3,4,6,8):
            fr = Fraction(round(params[i]/math.pi*den), den)
            dist = abs(params[i]-math.pi*float(fr))
            if dist < 0.45: cands.append((rank, dist, i, fr))
    cands.sort()
    for rank, dist, i, fr in cands:
        trial = params.copy(); trial[i]=math.pi*float(fr)
        restf=[j for j in range(n_par) if specs[j] is None and j!=i]
        trial,l2=gauss_newton(fns,trial,restf,iters=25)
        if l2/d<1e-24:
            specs[i]=format_spec(fr,0); params=trial; params[i]=math.pi*float(fr)
            print('gauge pin a%d=%s (dist %.3f)'%(i,specs[i],dist), flush=True); break
    else: raise SystemExit('no pin')
print('specs:', specs, flush=True)
theta = mp_refine(qc, meta, specs, params, dps=220, verbose=True)
from mpmath import mp, findpoly, tan, nstr
mp.dps = 220
free = [i for i in range(n_par) if specs[i] is None]
json.dump({'specs': specs,
           'theta_free': {str(i): nstr(theta[i], 210) for i in free}},
          open('/tmp/toff5_theta3.json','w'))
for i in free:
    t = tan(theta[i])
    got=None
    if abs(t) < mp.mpf(10)**150:
        for deg in (2,4,6,8,12,16):
            p = findpoly(t, deg, maxcoeff=10**7, tol=mp.mpf(10)**-180)
            if p is not None: got=(deg,[int(c) for c in p]); break
    else: got='INF (pi/2 multiple)'
    print('a%d = %s  poly=%s'%(i, nstr(theta[i], 25), got), flush=True)
