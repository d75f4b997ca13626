"""Tensor-parallel MLP demo: column/row-parallel pair over the 'model' axis
matches the unsharded computation (forward and training step)."""

import jax
import jax.numpy as jnp
import numpy as np

from ae_waveforms_tpu.parallel.mesh import data_mesh
from ae_waveforms_tpu.parallel.tp import mlp_forward_tp, shard_mlp_params, tp_train_step


def _params(key, d_in=12, hidden=32, d_out=1):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (d_in, hidden), jnp.float32) * 0.3,
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": jax.random.normal(k2, (hidden, d_out), jnp.float32) * 0.3,
        "b2": jnp.zeros((d_out,), jnp.float32),
    }


def _ref_forward(p, x):
    return jax.nn.relu(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def test_tp_forward_matches_unsharded():
    mesh = data_mesh(8, model_parallel=2)  # 4 data x 2 model
    params = _params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 12), jnp.float32)
    want = _ref_forward(params, x)
    sharded = shard_mlp_params(params, mesh)
    got = mlp_forward_tp(sharded, x, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
    # hidden axis is genuinely split: each w1 shard holds hidden/2 columns
    shard_shapes = {s.data.shape for s in sharded["w1"].addressable_shards}
    assert shard_shapes == {(12, 16)}


def test_tp_train_step_matches_unsharded():
    mesh = data_mesh(8, model_parallel=4)  # 2 data x 4 model
    params = _params(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (16, 12), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(4), (16,), jnp.float32)

    def ref_step(p):
        def loss_fn(q):
            return jnp.mean(jnp.square(_ref_forward(q, x)[:, 0] - y))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        return jax.tree_util.tree_map(lambda a, g: a - 0.1 * g, p, grads), loss

    want_p, want_loss = ref_step(params)
    got_p, got_loss = tp_train_step(shard_mlp_params(params, mesh), x, y, 0.1, mesh)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(got_p[k]), np.asarray(want_p[k]), rtol=1e-5, atol=1e-6
        )
    # gradient update preserved the tensor-parallel layout (no gather-back)
    assert {s.data.shape for s in got_p["w2"].addressable_shards} == {(8, 1)}
