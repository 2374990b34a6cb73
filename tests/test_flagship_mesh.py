"""Full-width flagship DP graph compiled and executed under a real mesh.

The dryrun entry (__graft_entry__.py) uses a reduced model for CPU-mesh
compile time; this slow-marked test closes the remaining gap (VERDICT r2 #9):
the 10.2M-param flagship (embed_dim 180, 6x6 depths, window ladder 4..64)
train step — with the kernel custom_vjps (scc_block / htb_tail / conv3x3) in
the graph — compiles and runs one batch-sharded step on a 2-device mesh,
exactly the sharding the Experiment runner uses for data parallelism.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.mark.slow
def test_flagship_dp_train_step_under_mesh():
    from sisr_tpu.models.hit_sir_pro import HiTSIR, flagship_config
    from sisr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from sisr_tpu.train.train_state import create_train_state, make_train_step

    model = HiTSIR(**flagship_config())
    rng = np.random.default_rng(0)
    lr_imgs = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    hr_imgs = jnp.asarray(rng.random((2, 256, 256, 3), np.float32))

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), lr_imgs[:1])
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables["params"]))
    assert n_params == 10_220_014  # the reference's exact flagship count

    mesh = make_mesh(2)
    tx = optax.adam(2e-5)
    state = replicate(mesh, create_train_state(variables["params"], tx))
    lr_s, hr_s = shard_batch(mesh, (lr_imgs, hr_imgs))
    assert len(lr_s.sharding.device_set) == 2

    step = make_train_step(model.apply, lambda a, b: jnp.abs(a - b).mean(), tx)
    new_state, loss = step(state, lr_s, hr_s, jax.random.PRNGKey(1))
    loss = float(loss)
    assert np.isfinite(loss) and 0 < loss < 1.0
    # params actually moved, and stayed replicated on the mesh
    delta = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params))
    assert max(delta) > 0
    leaf = jax.tree.leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 2
