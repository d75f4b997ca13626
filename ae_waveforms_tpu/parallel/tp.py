"""Tensor-parallel layer primitives over the mesh's 'model' axis.

The production models here are small enough that pure data parallelism is
optimal (see mesh.py), so these are capability demonstrations of the 2-D
layout the mesh supports: Megatron-style column-parallel -> row-parallel
dense pairs under ``shard_map``, with the single ``psum`` over ICI that the
pattern requires.  The pair is numerically identical to the unsharded MLP
(tests/test_tp.py validates forward and gradients on a virtual mesh).

Design notes (TPU):
- Column-parallel first layer: each model shard holds W1[:, h0:h1] and
  computes its slice of the hidden activations; no communication.
- Row-parallel second layer: each shard holds W2[h0:h1, :], contributes a
  partial product, and one ``psum`` over 'model' completes the matmul.
  This is the canonical 1-collective-per-pair layout; activations between
  the two layers never materialise unsharded.
- Batch stays sharded over 'data' throughout, composing with the DP mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_mlp_params(params: dict, mesh: Mesh) -> dict:
    """Place a 2-layer-MLP param tree in the column/row-parallel layout:
    W1/b1 split on the hidden axis over 'model', W2 split on its input
    (hidden) axis, output bias replicated."""
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))  # noqa: E731
    return {
        "w1": put(params["w1"], P(None, "model")),
        "b1": put(params["b1"], P("model")),
        "w2": put(params["w2"], P("model", None)),
        "b2": put(params["b2"], P()),
    }


def mlp_forward_tp(params: dict, x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Column->row parallel 2-layer MLP: relu(x W1 + b1) W2 + b2 with the
    hidden dimension sharded over the 'model' mesh axis."""

    def block(w1, b1, w2, b2, xb):
        h = jax.nn.relu(xb @ w1 + b1)  # local hidden slice, no comms
        part = h @ w2  # partial contribution of this shard
        return jax.lax.psum(part, "model") + b2

    fn = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(None, "model"), P("model"), P("model", None), P(), P("data", None)),
        out_specs=P("data", None),
        check_vma=False,
    )
    return fn(params["w1"], params["b1"], params["w2"], params["b2"], x)


@partial(jax.jit, static_argnames=("mesh",))
def _tp_train_step(params, x, y, lr, mesh):
    def loss_fn(p):
        logits = mlp_forward_tp(p, x, mesh)[:, 0]
        return jnp.mean(jnp.square(logits - y))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return new_params, loss


def tp_train_step(params, x, y, lr, mesh: Mesh):
    """One SGD step with tensor-parallel forward/backward; gradients for the
    sharded weights stay sharded (XLA transposes the psum into the backward
    pass automatically)."""
    return _tp_train_step(params, x, y, jnp.asarray(lr, jnp.float32), mesh)
