import jax; jax.config.update("jax_default_matmul_precision", "highest")
import numpy as np, jax.numpy as jnp
from dropout_hamiltonian_montecarlo_tpu.models import Softmax
from dropout_hamiltonian_montecarlo_tpu.io import datasets
from dropout_hamiltonian_montecarlo_tpu.ops.kron_metric import (
    gram_eigh, softmax_gauss_newton_metric, natural_gradient_map)
from dropout_hamiltonian_montecarlo_tpu.ops.tree import tree_add

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
U0 = -logd_e({"weights": jnp.zeros((784,10)), "bias": jnp.zeros((10,))})

@jax.jit
def phi(keys):
    def one(k):
        e = {"weights": jax.random.normal(k,(784,10)),
             "bias": jax.random.normal(jax.random.fold_in(k,1),(10,))}
        n2 = sum(jnp.sum(x**2) for x in jax.tree_util.tree_leaves(e))
        return (-logd_e(e) - U0) - 0.5*n2
    return jax.vmap(one)(keys)

ph = np.asarray(phi(jax.random.split(jax.random.key(5), 64)))
print("Phi over e~N(0,I): mean=%.2f std=%.2f min=%.2f max=%.2f" % (ph.mean(), ph.std(), ph.min(), ph.max()), flush=True)
