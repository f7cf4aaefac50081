"""Fused Pallas kernels: forward lifting+quantize, dequantize+inverse lifting.

The per-tile Haar lifting (wavelet_transform.rs:179-225,358-381) is 9
levels of stride-2 parent/child arithmetic. Expressed in plain XLA that is
~18 strided slices + elementwise passes, each a round trip through HBM;
these kernels do the whole tree walk in VMEM in one pass — the "fused
lifting kernel over [tiles, 512] blocks" of SURVEY.md section 7 phase 2.

Layout: coefficients as [N, T] (nodes on sublanes, tiles on lanes) so each
lifting level is a sublane-axis reshape — cheap vreg reorganization — and
a block of 128 tiles fills the 128-lane VPU exactly.

Data-dependent gathers (rANS tables, neighbour contexts) stay in XLA:
Mosaic has no vector int indexing on TPU ("Cannot do int indexing"), and
XLA's native gather lowering is the right tool there.

Masking note: missing leaves are pre-zeroed by the caller; the lifting
recurrences then produce exactly the masked reference semantics (missing
side contributes 0, mask-false nodes come out 0) with no mask tensor in
the kernel — see ops/jax_ops.forward_lifting for the invariant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# jax.experimental.pallas imports LAZILY: the import alone costs ~1.3 s
# of module loading, charged to every process — including CPU backends
# that never run a kernel (it was the single largest share of cold-host
# startup after the jax import itself; round-5 cold-start work). The
# kernel entry points resolve it on first use.
pl = None
pltpu = None


def _ensure_pallas():
    global pl, pltpu
    if pl is None:
        from jax.experimental import pallas as _pl
        from jax.experimental.pallas import tpu as _pltpu

        pl, pltpu = _pl, _pltpu


LANES = 128


def _trunc_div2(a):
    """Rust-style truncated division by 2 on int32 values."""
    return jnp.where(a < 0, -((-a) // 2), a // 2)


def _trunc_div(a, q):
    return jnp.where(a < 0, -((-a) // q), a // q)


def _fwd_kernel(depth: int, leaves_ref, lmask_ref, qdiv_ref, out_ref):
    n = 1 << depth
    vals = leaves_ref[:]  # [n, LANES] int32, leaves pre-masked to 0
    # masks stay int32 across reshapes: Mosaic rejects 3D shape casts of
    # i1 vectors ("infer-vector-layout: unsupported shape cast", measured
    # on v5e) while i32 reshapes lower fine
    mask = lmask_ref[:].astype(jnp.int32)  # [n, LANES] 0/1 leaf in-bounds
    qdiv = qdiv_ref[:]  # [n, 1] int32
    parts = [None] * (depth + 1)
    for level in range(depth - 1, -1, -1):
        m = 1 << (level + 1)
        pairs = vals.reshape(m // 2, 2, LANES)
        mp = mask.reshape(m // 2, 2, LANES)
        L, R = pairs[:, 0, :], pairs[:, 1, :]
        Lm, Rm = mp[:, 0, :], mp[:, 1, :]
        both = (Lm & Rm) > 0
        c = jnp.where(both, L - R, 0)
        parts[level] = c  # haar indices [2^level, 2^(level+1))
        vals = jnp.where(both, R + _trunc_div2(c), L + R)
        mask = Lm | Rm
    coef = jnp.concatenate([vals] + parts[:depth], axis=0)  # [n, LANES]
    out_ref[:] = _trunc_div(coef, qdiv)


def _inv_kernel(depth: int, qcoef_ref, nmask_ref, lmask_ref, qdiv_ref, out_ref):
    n = 1 << depth
    q = qdiv_ref[:]  # [n, 1]
    c_all = qcoef_ref[:]  # [n, LANES]
    # int32 masks: Mosaic rejects 3D shape casts of i1 vectors (see
    # _fwd_kernel)
    nmask = nmask_ref[:].astype(jnp.int32)  # node presence [n, LANES]
    lmask = lmask_ref[:].astype(jnp.int32)  # leaf in-bounds [n, LANES]
    # dequantize with midpoint bias (ops/jax_ops.dequantize)
    bias = jnp.sign(c_all) * ((q - 1) // 2)
    coef = c_all * q + bias
    vals = coef[0:1, :]
    for level in range(depth):
        lo, hi = 1 << level, 1 << (level + 1)
        c = coef[lo:hi, :]
        if level == depth - 1:
            mp = lmask.reshape(n // 2, 2, LANES)
        else:
            mp = nmask[2 * lo : 2 * hi, :].reshape(hi - lo, 2, LANES)
        both = (mp[:, 0, :] & mp[:, 1, :]) > 0
        right = jnp.where(both, vals - _trunc_div2(c), vals)
        left = jnp.where(both, c + right, vals)
        vals = jnp.stack([left, right], axis=1).reshape(2 * (hi - lo), LANES)
    out_ref[:] = vals  # leaves [n, LANES]


def _pad_tiles(x: jnp.ndarray) -> jnp.ndarray:
    t = x.shape[-1]
    pad = (-t) % LANES
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
        )
    return x


def forward_lift_quantize(
    leaves_nt: jnp.ndarray, leaf_mask_nt: jnp.ndarray, qdiv: jnp.ndarray, depth: int
) -> jnp.ndarray:
    """leaves_nt: [N, T] int32 (pre-masked); leaf_mask_nt: [N, T] bool/int;
    qdiv: [N] int32. Returns quantized coefficients [N, T] int32."""
    _ensure_pallas()
    n = 1 << depth
    assert leaves_nt.shape[0] == n
    T = leaves_nt.shape[1]
    x = _pad_tiles(leaves_nt)
    m = _pad_tiles(leaf_mask_nt.astype(jnp.int8))
    Tp = x.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, depth),
        grid=(Tp // LANES,),
        in_specs=[
            pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, Tp), jnp.int32),
    )(x, m, qdiv.reshape(n, 1))
    return out[:, :T]


def dequantize_inverse_lift(
    qcoef_nt: jnp.ndarray,
    node_mask_nt: jnp.ndarray,
    leaf_mask_nt: jnp.ndarray,
    qdiv: jnp.ndarray,
    depth: int,
) -> jnp.ndarray:
    """qcoef_nt: [N, T] int32; node/leaf masks [N, T]; returns leaves
    [N, T] int32 (garbage at mask-false leaves, never scattered)."""
    _ensure_pallas()
    n = 1 << depth
    assert qcoef_nt.shape[0] == n
    T = qcoef_nt.shape[1]
    x = _pad_tiles(qcoef_nt)
    nm = _pad_tiles(node_mask_nt.astype(jnp.int8))
    lm = _pad_tiles(leaf_mask_nt.astype(jnp.int8))
    Tp = x.shape[1]
    out = pl.pallas_call(
        functools.partial(_inv_kernel, depth),
        grid=(Tp // LANES,),
        in_specs=[
            pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, Tp), jnp.int32),
    )(x, nm, lm, qdiv.reshape(n, 1))
    return out[:, :T]


def pallas_supported() -> bool:
    """Pallas TPU kernels are used on real TPU backends only (interpret
    mode exists for tests; CPU production path stays XLA)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def lifting_enabled() -> bool:
    """Whether CodecProgram routes lifting/quantization through these
    kernels. Default: on for real TPU backends, off on CPU (the XLA
    path is the exact arithmetic twin either way — flipping the flag
    never changes bits, only the lowering). FRAVE_PALLAS=0/1 forces."""
    import os

    env = os.environ.get("FRAVE_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    return pallas_supported()
