"""Phase 2: 320-digit refinement + deep algebraic identification of the
five holdout angles of the relphase toffoli-5 row."""
import numpy as np, math, json, itertools
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
while True:
    rep = null_space_report(fns, params, specs)
    if rep['null_dim'] == 0: break
    order = sorted(rep['gauge'], key=lambda i: -rep['participation'][i])
    cands = []
    for i in order:
        for den in (1,2,3,4,6,8):
            fr = Fraction(round(params[i]/math.pi*den), den)
            dist = abs(params[i]-math.pi*float(fr))
            if dist < 0.45: cands.append((dist,i,fr))
    cands.sort()
    for dist,i,fr in cands:
        trial = params.copy(); trial[i]=math.pi*float(fr)
        restf=[j for j in range(n_par) if specs[j] is None and j!=i]
        trial,l2=gauss_newton(fns,trial,restf,iters=25)
        if l2/d<1e-24:
            specs[i]=format_spec(fr,0); params=trial; params[i]=math.pi*float(fr)
            print('gauge pin a%d=%s'%(i,specs[i]), flush=True); break
    else: raise SystemExit('no pin')
print('specs:', specs, flush=True)
theta = mp_refine(qc, meta, specs, params, dps=320, verbose=True)
from mpmath import mp, findpoly, tan, nstr
mp.dps = 320
free = [i for i in range(n_par) if specs[i] is None]
dump = {str(i): nstr(theta[i], 310) for i in free}
json.dump({'specs': specs, 'theta_free': dump}, open('/tmp/toff5_theta.json','w'))
print('dumped', flush=True)
HOLD = [i for i in free]
for i in HOLD:
    t = tan(theta[i])
    got=None
    for deg in (4,6,8,12,16,20,24):
        p = findpoly(t, deg, maxcoeff=10**8, tol=mp.mpf(10)**-260)
        if p is not None: got=(deg,[int(c) for c in p]); break
    print('single a%d deg=%s'%(i,got), flush=True)
# pairwise sums/diffs
for i,j in itertools.combinations(HOLD, 2):
    for sgn,lbl in ((1,'+'),(-1,'-')):
        t = tan(theta[i]+sgn*theta[j])
        for deg in (2,4,6,8):
            p = findpoly(t, deg, maxcoeff=10**6, tol=mp.mpf(10)**-260)
            if p is not None:
                print('pair a%d%sa%d deg=%d %s'%(i,lbl,j,deg,[int(c) for c in p]), flush=True)
                break
