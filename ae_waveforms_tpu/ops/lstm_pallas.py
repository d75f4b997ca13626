"""Fused stacked-LSTM encoder as a Pallas TPU kernel.

The LSTM-AE encoder is three chained scans (1->128->64->latent).  Under XLA
each layer's full hidden sequence round-trips through HBM between scans
(~(B, T, H) per layer per direction).  This kernel runs the whole encoder in
ONE pallas program: the grid iterates over time (TPU grid steps execute
sequentially on a core, so VMEM scratch carries the six recurrent states
across steps), all three cells' weights stay resident in VMEM, and the only
HBM traffic is the layer-1 input projections streaming in one timestep per
grid step and the final latent writing out once.

Measured on TPU v5e (B=128, T=320, latent 10): matches the XLA scan to
2.4e-6 at identical throughput (~0.95 ms/encode) — at these model sizes the
sequential per-step latency floor, not HBM traffic, bounds both
implementations, so the default inference path stays on the XLA scan and
this kernel serves as the fusion template for wider recurrent stacks.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["encode_fused"]


def _cell(gates, h, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    o = jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c2 = f * c + i * g
    return o * jnp.tanh(c2), c2


def _encoder_kernel(
    gx1_ref,  # (1, B, 4*H1) layer-1 input projections for this timestep
    whh1_ref,  # (H1, 4*H1)
    wih2_ref,  # (H1, 4*H2)
    whh2_ref,  # (H2, 4*H2)
    b2_ref,  # (1, 4*H2)
    wih3_ref,  # (H2, 4*L)
    whh3_ref,  # (L, 4*L)
    b3_ref,  # (1, 4*L)
    out_ref,  # (B, L)
    h1,
    c1,
    h2,
    c2,
    h3,
    c3,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        for ref in (h1, c1, h2, c2, h3, c3):
            ref[:] = jnp.zeros_like(ref)

    g1 = gx1_ref[0, :, :] + jnp.dot(h1[:], whh1_ref[:], preferred_element_type=jnp.float32)
    nh1, nc1 = _cell(g1, h1[:], c1[:])
    h1[:], c1[:] = nh1, nc1

    g2 = (
        jnp.dot(nh1, wih2_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h2[:], whh2_ref[:], preferred_element_type=jnp.float32)
        + b2_ref[0, :]
    )
    nh2, nc2 = _cell(g2, h2[:], c2[:])
    h2[:], c2[:] = nh2, nc2

    g3 = (
        jnp.dot(nh2, wih3_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(h3[:], whh3_ref[:], preferred_element_type=jnp.float32)
        + b3_ref[0, :]
    )
    nh3, nc3 = _cell(g3, h3[:], c3[:])
    h3[:], c3[:] = nh3, nc3

    @pl.when(t == pl.num_programs(0) - 1)
    def _emit():
        out_ref[:] = nh3


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_fused(params: Dict, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """LSTM-AE encoder latent (B, latent) via the fused kernel.

    params: the lstm_ae parameter pytree; x: (B, T, 1).
    """
    B, T, _ = x.shape
    p1, p2, p3 = params["enc1"], params["enc2"], params["enc3"]
    H1 = p1["w_hh"].shape[1]
    H2 = p2["w_hh"].shape[1]
    L = p3["w_hh"].shape[1]

    # layer-1 input projection hoisted onto the MXU outside the kernel;
    # time-major layout so each grid step's block is (1, B, 4*H1) — the last
    # two dims then satisfy the TPU (8, 128) tiling constraint
    gx1 = x @ p1["w_ih"].T + (p1["b_ih"] + p1["b_hh"])  # (B, T, 4*H1)
    gx1 = jnp.swapaxes(gx1, 0, 1)  # (T, B, 4*H1)

    return pl.pallas_call(
        _encoder_kernel,
        out_shape=jax.ShapeDtypeStruct((B, L), jnp.float32),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, 4 * H1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, L), lambda t: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H1), jnp.float32),
            pltpu.VMEM((B, H1), jnp.float32),
            pltpu.VMEM((B, H2), jnp.float32),
            pltpu.VMEM((B, H2), jnp.float32),
            pltpu.VMEM((B, L), jnp.float32),
            pltpu.VMEM((B, L), jnp.float32),
        ],
        interpret=interpret,
    )(
        gx1.astype(jnp.float32),
        p1["w_hh"].T.astype(jnp.float32),
        p2["w_ih"].T.astype(jnp.float32),
        p2["w_hh"].T.astype(jnp.float32),
        (p2["b_ih"] + p2["b_hh"])[None, :].astype(jnp.float32),
        p3["w_ih"].T.astype(jnp.float32),
        p3["w_hh"].T.astype(jnp.float32),
        (p3["b_ih"] + p3["b_hh"])[None, :].astype(jnp.float32),
    )
