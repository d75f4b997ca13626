"""Fused routing kernel (ops/gbt_route_pallas.py) vs the XLA routing chain.

Routing is an integer decision, so every comparison here is EXACT equality
— any tolerance would hide a mis-routed row that silently changes which
histogram a sample lands in for the rest of the tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ae_waveforms_tpu.ops.gbt_route_pallas import (
    _route_xla_batched,
    _tile_for,
    route_rows,
    route_vmem_feasible,
)


def _case(rng, n, F, S, n_nodes, n_bins=64):
    bins = rng.integers(0, n_bins, size=(n, F)).astype(np.int32)
    binsT = jnp.asarray(bins.T.astype(np.float32))
    node = jnp.asarray(rng.integers(0, n_nodes, size=(S, n)).astype(np.int32))
    bf = jnp.asarray(rng.integers(0, F, size=(S, n_nodes)).astype(np.int32))
    bb = jnp.asarray(rng.integers(0, n_bins, size=(S, n_nodes)).astype(np.int32))
    do = jnp.asarray(rng.random((S, n_nodes)) < 0.7)
    return binsT, node, bf, bb, do


@pytest.mark.parametrize("n_nodes", [1, 2, 8, 32])
def test_vmapped_matches_xla_exactly(n_nodes):
    rng = np.random.default_rng(n_nodes)
    binsT, node, bf, bb, do = _case(rng, n=1000, F=10, S=5, n_nodes=n_nodes)
    ref = _route_xla_batched(binsT, node, bf, bb, do, n_nodes)
    got = jax.vmap(
        lambda nd, f, b, d: route_rows(
            binsT, nd, f, b, d, n_nodes=n_nodes, interpret=True
        )
    )(node, bf, bb, do)
    assert got.dtype == jnp.int32
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_unvmapped_single_fit():
    rng = np.random.default_rng(7)
    binsT, node, bf, bb, do = _case(rng, n=700, F=10, S=1, n_nodes=8)
    ref = _route_xla_batched(binsT, node, bf, bb, do, 8)
    got = route_rows(binsT, node[0], bf[0], bb[0], do[0], n_nodes=8,
                     interpret=True)
    assert np.array_equal(np.asarray(ref[0]), np.asarray(got))


def test_no_split_descends_left_spine():
    rng = np.random.default_rng(3)
    binsT, node, bf, bb, _ = _case(rng, n=400, F=10, S=3, n_nodes=4)
    do = jnp.zeros((3, 4), bool)
    got = jax.vmap(
        lambda nd, f, b, d: route_rows(binsT, nd, f, b, d, n_nodes=4,
                                       interpret=True)
    )(node, bf, bb, do)
    assert np.array_equal(np.asarray(got), 2 * np.asarray(node))


def test_unpadded_n_multiple_of_512():
    rng = np.random.default_rng(11)
    binsT, node, bf, bb, do = _case(rng, n=1024, F=10, S=4, n_nodes=8)
    ref = _route_xla_batched(binsT, node, bf, bb, do, 8)
    got = jax.vmap(
        lambda nd, f, b, d: route_rows(binsT, nd, f, b, d, n_nodes=8,
                                       interpret=True)
    )(node, bf, bb, do)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_vmem_feasibility_monotone_and_shipped_shape():
    # the shipped sweep shape (S=96 fit chunks, depth-6 trees: deepest
    # routing level has 32 nodes, F=10) must run the kernel
    assert route_vmem_feasible(96, 32, 10)
    # monotone in n_nodes: once infeasible, deeper stays infeasible
    feas = [route_vmem_feasible(96, 2 ** d, 10) for d in range(12)]
    assert feas == sorted(feas, reverse=True)
    # something is eventually infeasible (the model is not vacuous)
    assert not route_vmem_feasible(96, 2 ** 11, 10)


def test_infeasible_shape_falls_back_to_xla_inside_jit():
    S, n_nodes = 96, 2 ** 11
    assert _tile_for(S, S * n_nodes, 10) == 0
    rng = np.random.default_rng(5)
    binsT, node, bf, bb, do = _case(rng, n=300, F=10, S=S, n_nodes=n_nodes)
    ref = _route_xla_batched(binsT, node, bf, bb, do, n_nodes)
    got = jax.vmap(
        lambda nd, f, b, d: route_rows(binsT, nd, f, b, d,
                                       n_nodes=n_nodes, interpret=False)
    )(node, bf, bb, do)
    assert np.array_equal(np.asarray(ref), np.asarray(got))
