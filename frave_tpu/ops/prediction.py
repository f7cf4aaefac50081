"""Context prediction: MED (LF) + learned 6-tap linear (HF), vectorized.

Reference: prediction.rs:86-207. Both the encoder (parallel over all
symbols) and the decoder (parallel over one wavefront step) call the same
context function, which is what guarantees self-consistency; float ops are
IEEE f32 elementwise with a fixed order on both sides.

Robustness divergence from the reference: predictions are clamped to
[-255, 255] so every residual's zig-zag symbol fits the 1024-symbol
alphabet. The reference indexes freqs[symbol] unchecked and would panic on
e.g. a MED prediction of v0+v2-v1 up to +-765 against an opposite-sign
coefficient (prediction.rs:251 with ALPHABET_SIZE=1024); clamping can only
tighten predictions of values that are themselves in [-255, 255].
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..entropy.tables import assign_bucket

PRED_CLAMP = 255


def contexts_np(
    vals: np.ndarray,  # [..., 6] int gathered neighbour values (0 where absent)
    lf: np.ndarray,  # [...] bool LF (MED) vs HF (learned)
    group: np.ndarray,  # [...] int param group 0/1/2
    vparams: np.ndarray,  # [3, 6] float32 value predictor per group
    wparams: np.ndarray,  # [3, 6] float32 width predictor per group
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (bucket [...] int32, prediction [...] int32)."""
    v = vals.astype(np.int64)
    v0, v1, v2, v3, v4, v5 = (v[..., i] for i in range(6))

    # --- LF: LOCO-I/MED median predictor + |v0-v2| width (prediction.rs:134-148)
    mx = np.maximum(v0, v2)
    mn = np.minimum(v0, v2)
    med = np.where(v1 >= mx, mx, np.where(v1 <= mn, mn, v0 + v2 - v1))
    lf_width = np.abs(v0 - v2).astype(np.float64)
    lf_bucket = assign_bucket(lf_width)

    # --- HF: learned width from 5 gradient features + bias, learned value
    # from the 6 neighbour taps (prediction.rs:190-206). f32 arithmetic.
    vp = vparams.astype(np.float32)[group]  # [..., 6]
    wp = wparams.astype(np.float32)[group]
    vf = vals.astype(np.float32)
    g1 = np.abs(vf[..., 0] - vf[..., 3])
    g2 = np.abs(vf[..., 1] - vf[..., 2])
    g3 = np.abs(vf[..., 4] - vf[..., 5])
    g4 = np.abs(vf[..., 1] - vf[..., 5])
    g5 = np.abs(vf[..., 2] - vf[..., 4])
    hf_width = (
        wp[..., 0]
        + wp[..., 1] * g1
        + wp[..., 2] * g2
        + wp[..., 3] * g3
        + wp[..., 4] * g4
        + wp[..., 5] * g5
    ).astype(np.float32)
    # flat-context rule: identical neighbourhood (all gradient features
    # zero) means the residual is almost surely 0 — force the
    # zero-residual bucket regardless of the learned width's bias floor.
    # Computed identically on encode and decode (and in the jax twin).
    gsum = (g1 + g2 + g3 + g4 + g5).astype(np.float32)
    hf_width = np.where(gsum == np.float32(0), np.float32(0), hf_width)
    hf_bucket = assign_bucket(hf_width)
    hf_pred_f = (
        vf[..., 0] * vp[..., 0]
        + vf[..., 1] * vp[..., 1]
        + vf[..., 2] * vp[..., 2]
        + vf[..., 3] * vp[..., 3]
        + vf[..., 4] * vp[..., 4]
        + vf[..., 5] * vp[..., 5]
    ).astype(np.float32)
    # Rust `as i32`: truncate toward zero, saturate, NaN -> 0.
    hf_pred = np.where(
        np.isnan(hf_pred_f),
        0,
        np.trunc(np.clip(hf_pred_f, -2147483648.0, 2147483647.0)),
    ).astype(np.int64)

    bucket = np.where(lf, lf_bucket, hf_bucket).astype(np.int32)
    pred = np.where(lf, med, hf_pred)
    pred = np.clip(pred, -PRED_CLAMP, PRED_CLAMP).astype(np.int32)
    return bucket, pred


def gather_neighbour_values(coef_flat: np.ndarray, nbr_idx: np.ndarray) -> np.ndarray:
    """coef_flat [..., T*N] int; nbr_idx [K, 6] int32 (-1 absent).
    Returns [..., K, 6] with 0 for absent (unwrap_or(0) semantics,
    context_modeling.rs:48,66)."""
    idx = np.clip(nbr_idx.astype(np.int64), 0, None)
    vals = coef_flat[..., idx]
    return np.where(nbr_idx >= 0, vals, 0)
