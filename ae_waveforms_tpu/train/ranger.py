"""Ranger (RAdam + Lookahead) as an optax GradientTransformation.

Update math follows the published Ranger optimizer the reference vendors
(functions_ae/ranger_optimizer.py:27-169): RAdam variance rectification with
SMA threshold (default 5), decoupled weight decay ``p -= wd * lr * p``
applied before the step, and integrated Lookahead every k=6 steps with
slow-weight interpolation alpha=0.5.  The reference's per-step
``radam_buffer`` memo cache is just a host-side memoization of
step-dependent scalars — here they are recomputed in-graph each step (free
under XLA fusion).

The reference wiring bug (``cfg.ranger_n_threshold`` vs the argparse flag
``ranger_threshold``, run_train.py:223 / main_ae.py:105, which makes
``--optimizer_type ranger`` crash upstream) is fixed; the math is preserved.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

__all__ = ["ranger", "RangerState"]


class RangerState(NamedTuple):
    count: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    slow: optax.Params


def ranger(
    learning_rate: Union[float, Callable],
    betas=(0.95, 0.999),
    eps: float = 1e-5,
    weight_decay: float = 0.0,
    n_sma_threshold: int = 5,
    k: int = 6,
    alpha: float = 0.5,
) -> optax.GradientTransformation:
    beta1, beta2 = betas

    def init_fn(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RangerState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=zeros,
            exp_avg_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            slow=jax.tree_util.tree_map(jnp.array, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("ranger requires params")
        step = state.count + 1
        lr = learning_rate(step) if callable(learning_rate) else learning_rate
        step_f = step.astype(jnp.float32)

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: beta1 * m + (1 - beta1) * g, state.exp_avg, grads
        )
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: beta2 * v + (1 - beta2) * g * g, state.exp_avg_sq, grads
        )

        # 1 - beta^t via expm1 to avoid float32 cancellation in the SMA chain
        one_minus_beta2_t = -jnp.expm1(step_f * jnp.log(jnp.float32(beta2)))
        beta2_t = 1.0 - one_minus_beta2_t
        n_sma_max = 2.0 / (1 - beta2) - 1.0
        n_sma = n_sma_max - 2.0 * step_f * beta2_t / one_minus_beta2_t
        rectified = n_sma > n_sma_threshold
        rect_term = jnp.sqrt(
            (1 - beta2_t)
            * (n_sma - 4.0)
            / (n_sma_max - 4.0)
            * (n_sma - 2.0)
            / n_sma
            * n_sma_max
            / (n_sma_max - 2.0)
        )
        bias1 = -jnp.expm1(step_f * jnp.log(jnp.float32(beta1)))
        step_size = jnp.where(rectified, rect_term / bias1, 1.0 / bias1)

        def one(p, m, v, slow):
            p_wd = p - p * (weight_decay * lr) if weight_decay != 0 else p
            adaptive = p_wd - (step_size * lr) * m / (jnp.sqrt(v) + eps)
            plain = p_wd - (step_size * lr) * m
            p_new = jnp.where(rectified, adaptive, plain)
            do_la = (step % k) == 0
            slow_new = jnp.where(do_la, slow + alpha * (p_new - slow), slow)
            p_final = jnp.where(do_la, slow_new, p_new)
            return p_final - p, slow_new

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_m = treedef.flatten_up_to(exp_avg)
        flat_v = treedef.flatten_up_to(exp_avg_sq)
        flat_s = treedef.flatten_up_to(state.slow)
        deltas, slows = zip(*[one(p, m, v, s) for p, m, v, s in zip(flat_p, flat_m, flat_v, flat_s)])
        updates = jax.tree_util.tree_unflatten(treedef, deltas)
        new_slow = jax.tree_util.tree_unflatten(treedef, slows)

        return updates, RangerState(step, exp_avg, exp_avg_sq, new_slow)

    return optax.GradientTransformation(init_fn, update_fn)
