"""Optimizer factory (reference: run_train.py:215-230 selection with torch
defaults).

Every optimizer is wrapped in ``optax.inject_hyperparams`` so the learning
rate is a runtime value inside the jitted train step — schedules and the
plateau-triggered StepLR multiplier both just overwrite
``opt_state.hyperparams['learning_rate']`` without recompilation.

Coupled (torch-style L2) weight decay is folded into the gradient before the
moment updates for adam/sgd/rmsprop/adagrad/adadelta, matching
``torch.optim``; Ranger uses its own decoupled rule internally.
"""

from __future__ import annotations

import optax

from ae_waveforms_tpu.train.ranger import ranger

__all__ = ["make_optimizer"]


def _with_l2(core: optax.GradientTransformation, weight_decay: float, lr) -> optax.GradientTransformation:
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(core)
    steps.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*steps)


def make_optimizer(name: str, learning_rate: float, weight_decay: float = 0.0, **kw) -> optax.GradientTransformation:
    name = name.lower()

    @optax.inject_hyperparams
    def build(learning_rate):
        if name == "adam":
            return _with_l2(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), weight_decay, learning_rate)
        if name == "adagrad":
            return _with_l2(
                optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10), weight_decay, learning_rate
            )
        if name == "adadelta":
            return _with_l2(optax.scale_by_adadelta(rho=0.9, eps=1e-6), weight_decay, learning_rate)
        if name == "sgd":
            momentum = kw.get("momentum", 0.9)
            core = optax.trace(decay=momentum, nesterov=False) if momentum else optax.identity()
            return _with_l2(core, weight_decay, learning_rate)
        if name == "rmsprop":
            # eps outside the sqrt, as torch.optim.RMSprop applies it
            return _with_l2(
                optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False), weight_decay, learning_rate
            )
        if name == "ranger":
            return ranger(
                learning_rate,
                betas=(kw.get("ranger_momentum", 0.95), 0.999),
                weight_decay=weight_decay,
                n_sma_threshold=kw.get("ranger_threshold", 5),
            )
        raise ValueError(f"unsupported optimizer {name!r}")

    return build(learning_rate=learning_rate)
