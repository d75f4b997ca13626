"""Checkpoint round-trips and full train-state resume."""

import numpy as np
import jax
import jax.numpy as jnp

from ae_waveforms_tpu.core.config import TrainConfig
from ae_waveforms_tpu.core.schema import save_arrays
from ae_waveforms_tpu.models import conv_ae
from ae_waveforms_tpu.train import checkpoint as ckpt
from ae_waveforms_tpu.train.optimizers import make_optimizer


def test_state_roundtrip_with_optimizer(tmp_path):
    params = conv_ae.init(jax.random.PRNGKey(0), 4)
    opt = make_optimizer("ranger", 1e-3)
    opt_state = opt.init(params)
    state = {"params": params, "opt_state": opt_state, "rng": jax.random.PRNGKey(3), "step": jnp.asarray(17)}
    path = str(tmp_path / "s.npz")
    ckpt.save_state(path, state)

    template = {
        "params": conv_ae.init(jax.random.PRNGKey(1), 4),
        "opt_state": opt.init(conv_ae.init(jax.random.PRNGKey(1), 4)),
        "rng": jax.random.PRNGKey(0),
        "step": jnp.asarray(0),
    }
    back = ckpt.load_state(path, template)
    assert int(back["step"]) == 17
    ref_leaves = jax.tree_util.tree_leaves(state)
    got_leaves = jax.tree_util.tree_leaves(back)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optax state types survive so .update() keeps working
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    opt.update(g, back["opt_state"], back["params"])


def test_resume_continues_training(tmp_path):
    from tests.test_train import _toy_arrays
    from ae_waveforms_tpu.train.loop import main_train

    arrays = _toy_arrays(n=200, n_cases=20)
    dataset_dir = str(tmp_path / "data")
    save_arrays(arrays, dataset_dir)
    cfg = TrainConfig(
        dataset_dir=dataset_dir,
        results_dir=str(tmp_path / "results"),
        model_class="LeNet5AutoencoderAvgPool",
        latent_size=4,
        batch_size=32,
        epochs=1,
        validation_interval=2,
        split_size_val=0.25,
        split_size_test=0.25,
        seed=1,
        plotting=False,
    )
    run1 = main_train(cfg, arrays=arrays, max_steps=4)
    run2 = main_train(cfg, arrays=arrays, max_steps=8, resume_dir=run1)
    assert run2 != run1
    import os

    assert os.path.isfile(os.path.join(run2, "model_autoencoder.npz"))
