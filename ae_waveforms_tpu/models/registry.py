"""Model registry (reference: model_classes.py:113-116 dict of classes).

Each entry exposes the functional triple (init, forward, encode) plus the
input layout flag the data pipeline needs: conv models take (B, 1, 320)
("channel-first"), recurrent models take (B, 320, 1) (load_data.py:35-46
swap_dim logic, keyed on "LSTM" in the class name just like run_train.py
:495-497).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict

from ae_waveforms_tpu.models import conv_ae, lstm_ae

__all__ = ["MODEL_REGISTRY", "ModelDef", "build_model", "input_layout"]


@dataclass(frozen=True)
class ModelDef:
    name: str
    init: Callable
    forward: Callable
    encode: Callable
    channel_first: bool  # True -> (B, 1, L); False -> (B, L, 1)
    latent_axis_squeeze: int  # axis squeezed when exporting latents


MODEL_REGISTRY: Dict[str, ModelDef] = {
    "LSTMAutoencoder": ModelDef(
        name="LSTMAutoencoder",
        init=lstm_ae.init,
        forward=lstm_ae.forward,
        encode=lstm_ae.latent_of,
        channel_first=False,
        latent_axis_squeeze=-1,  # latents already (B, d)
    ),
    "LeNet5AutoencoderAvgPool": ModelDef(
        name="LeNet5AutoencoderAvgPool",
        init=conv_ae.init,
        forward=conv_ae.forward,
        encode=conv_ae.latent_of,
        channel_first=True,
        latent_axis_squeeze=2,  # (B, d, 1) -> (B, d)
    ),
}


def build_model(name: str, key, latent_size: int, dropout: float = 0.2):
    if name not in MODEL_REGISTRY:
        raise ValueError(f"unknown model class {name!r}; available: {sorted(MODEL_REGISTRY)}")
    mdef = MODEL_REGISTRY[name]
    params = mdef.init(key, latent_size, dropout)
    return mdef, params


def input_layout(name: str) -> bool:
    """True if the model consumes (B, 1, L) channel-first input."""
    return MODEL_REGISTRY[name].channel_first
