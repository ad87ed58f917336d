import sys, time
import jax
PREC = sys.argv[1] if len(sys.argv) > 1 else "highest"
jax.config.update("jax_default_matmul_precision", PREC)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import numpy as np, jax.numpy as jnp
from dropout_hamiltonian_montecarlo_tpu.models import Softmax
from dropout_hamiltonian_montecarlo_tpu.io import datasets
from dropout_hamiltonian_montecarlo_tpu.inference import hmc
from dropout_hamiltonian_montecarlo_tpu.inference.base import run_inference
from dropout_hamiltonian_montecarlo_tpu.inference.warmup import run_warmup
from dropout_hamiltonian_montecarlo_tpu.diagnostics.ess import effective_sample_size
from dropout_hamiltonian_montecarlo_tpu.ops.kron_metric import (
    gram_eigh, softmax_gauss_newton_metric, natural_gradient_map)
from dropout_hamiltonian_montecarlo_tpu.ops.tree import tree_add

C, W, S = 16, 300, 500
X, yi = datasets.mnist()
y = (yi[:, None] == jnp.arange(10)).astype(jnp.float32)
model = Softmax(dim=784, n_classes=10, alpha=1.0)
logd = model.make_logdensity(batch=(X, y))
gram = gram_eigh(X)
m0 = softmax_gauss_newton_metric(X, 10, alpha=1.0, gram=gram)
qmap = natural_gradient_map(logd, m0, model.init_params(jax.random.key(0)), num_steps=60)
probs = model.predict(qmap, X, prob=True)
M = softmax_gauss_newton_metric(X, 10, alpha=1.0, gram=gram, probs=probs)
def logd_e(e): return logd(tree_add(qmap, M.unwhiten(e)))

def run_cfg(L, jitter, target, am=True):
    kernel = hmc.build_kernel(logd_e, L, jitter_steps=jitter)
    @jax.jit
    def warm(key):
        eks = jax.random.split(jax.random.fold_in(key,0), C)
        wks = jax.random.split(jax.random.fold_in(key,1), C)
        def one(ke, kw):
            e0 = {"weights": jax.random.normal(ke,(784,10),jnp.float32),
                  "bias": jax.random.normal(jax.random.fold_in(ke,1),(10,),jnp.float32)}
            return run_warmup(kernel, hmc.init(e0, logd_e), kw, W,
                              initial_step_size=0.1, target_acceptance=target, adapt_mass=am)
        return jax.vmap(one)(eks, wks)
    @jax.jit
    def sample(states, ss, im, key):
        ks = jax.random.split(key, C)
        def one(s, s_, i_, k):
            fixed = lambda k2, st: kernel(k2, st, s_, i_)
            _, (sts, infos) = run_inference(fixed, s, k, S)
            return sts.position, infos
        return jax.vmap(one)(states, ss, im, ks)
    @jax.jit
    def ess_of(e_draws):
        q = jax.vmap(jax.vmap(lambda e: tree_add(qmap, M.unwhiten(e))))(e_draws)
        return jnp.concatenate([effective_sample_size(q["weights"]).ravel(),
                                effective_sample_size(q["bias"]).ravel()])
    wr = warm(jax.random.key(1)); jax.block_until_ready(wr.step_size)
    d, inf = sample(wr.state, wr.step_size, wr.inv_mass, jax.random.key(2))
    jax.block_until_ready(d["bias"])
    t0 = time.time()
    d, inf = sample(wr.state, wr.step_size, wr.inv_mass, jax.random.key(3))
    jax.block_until_ready(d["bias"])
    t = time.time() - t0
    ess = np.asarray(ess_of(d))
    acc = float(np.asarray(inf.acceptance_prob).mean())
    med, mn = float(np.median(ess)), float(ess.min())
    eps = np.asarray(wr.step_size)
    print(f"prec={PREC} L={L} jit={int(jitter)} tgt={target} am={int(am)}: eps_med={np.median(eps):.3f} "
          f"acc={acc:.3f} t={t:.2f}s ESS med={med:.0f} min={mn:.0f} -> med {med/t:.0f}/s min {mn/t:.0f}/s", flush=True)

import ast
L = int(sys.argv[2]); jit_ = sys.argv[3] == "1"; tgt = float(sys.argv[4])
am = sys.argv[5] == "1" if len(sys.argv) > 5 else True
run_cfg(L, jit_, tgt, am)
