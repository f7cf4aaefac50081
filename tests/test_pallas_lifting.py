"""Pallas fused lifting kernels vs the XLA ops (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from frave_tpu.ops import jax_ops as J


def _run_interpret(fn, *args):
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return fn(*args)


@pytest.mark.parametrize("depth,T", [(9, 130), (7, 64)])
def test_forward_matches_xla(depth, T):
    from frave_tpu.ops.pallas_lifting import forward_lift_quantize

    rng = np.random.default_rng(0)
    n = 1 << depth
    leaves = rng.integers(0, 256, size=(T, n)).astype(np.int32)
    mask = rng.random((T, n)) > 0.15
    leaves = np.where(mask, leaves, 0)
    qdiv = np.ones(n, np.int32)
    qdiv[n // 2 :] = 3

    ref = np.asarray(
        J.quantize(
            J.forward_lifting(jnp.asarray(leaves)[None], jnp.asarray(mask)[None], depth),
            jnp.asarray(qdiv)[None, None, :],
        )
    )[0]
    out = np.asarray(
        _run_interpret(
            forward_lift_quantize,
            jnp.asarray(leaves.T),
            jnp.asarray(mask.T),
            jnp.asarray(qdiv),
            depth,
        )
    ).T
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("depth,T", [(9, 130)])
def test_inverse_matches_xla(depth, T):
    from frave_tpu.ops.pallas_lifting import dequantize_inverse_lift

    rng = np.random.default_rng(1)
    n = 1 << depth
    qcoef = rng.integers(-80, 80, size=(T, n)).astype(np.int32)
    node_mask = rng.random((T, n)) > 0.1
    leaf_mask = rng.random((T, n)) > 0.1
    qdiv = np.ones(n, np.int32)
    qdiv[n // 4 :] = 2

    ref = np.asarray(
        J.inverse_lifting(
            J.dequantize(jnp.asarray(qcoef)[None], jnp.asarray(qdiv)[None, None, :]),
            depth,
            jnp.asarray(node_mask)[None],
            jnp.asarray(leaf_mask)[None],
        )
    )[0]
    out = np.asarray(
        _run_interpret(
            dequantize_inverse_lift,
            jnp.asarray(qcoef.T),
            jnp.asarray(node_mask.T),
            jnp.asarray(leaf_mask.T),
            jnp.asarray(qdiv),
            depth,
        )
    ).T
    np.testing.assert_array_equal(out, ref)
