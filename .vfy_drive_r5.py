import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from cpflow_tpu import Synthesize, StaticOptions
from cpflow_tpu.ops.gates import u_ccz3
from cpflow_tpu.topology import chain_layer

t0 = time.time()
s = Synthesize(chain_layer(3), target_unitary=u_ccz3, label='vfy_r5')
res = s.static(StaticOptions(num_cp_gates=12, num_samples=10,
                             accepted_num_cz_gates=8, random_seed=1),
               save_results=False, verbose=False)
best = min((d.cz_count for d in res.decompositions), default=None)
print(json.dumps({'backend': jax.default_backend(),
                  'wall_s': round(time.time() - t0, 1),
                  'n_verified': len(res.decompositions),
                  'best_cz': best,
                  'best_loss': float(min((d.loss for d in res.decompositions),
                                         default=float('nan')))}))
assert jax.default_backend() == 'tpu'
assert best == 8, best
print('VERIFY PASS')
