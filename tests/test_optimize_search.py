"""Outer predictor-vector search (round 5, VERDICT r4 #7 — the
optimize.rs:16-32,103-126 capability): trial encodes with pinned
parameters via EncoderOptions.value_prediction_params, scored by the
in-memory metrics sink instead of the reference's ./mse side files."""

from __future__ import annotations

import numpy as np

from frave_tpu import ColorSpace, EncoderOptions, RasterImage
from frave_tpu.cli.main import find_predictor_vectors, search_predictors
from frave_tpu.codec.container import deserialize
from frave_tpu.codec.encoder import FRIEncoder


def _img(seed=3, h=64, w=64):
    rng = np.random.default_rng(seed)
    base = np.cumsum(rng.normal(0, 5, (h, w, 1)), axis=1)
    px = np.clip(base + 128, 0, 255).astype(np.uint8)
    return RasterImage.from_array(px, ColorSpace.LUMA)


def test_injected_params_reproduce_fit_bit_for_bit():
    """Pinning BOTH parameter sets extracted from a container must
    reproduce that container byte-for-byte — the property that lets an
    outer search trust its trial encodes (and the reference's
    encoder.rs:58-64 injection contract)."""
    img = _img()
    opts = EncoderOptions(backend="numpy")
    blob = FRIEncoder(opts).encode(img)
    ci = deserialize(blob)
    cd = ci.channel_data[0]
    opts2 = EncoderOptions(
        backend="numpy",
        num_lanes=ci.num_lanes,
        value_prediction_params=cd.value_prediction_parameters[None],
        width_prediction_params=cd.width_prediction_parameters[None],
    )
    blob2 = FRIEncoder(opts2).encode(img)
    assert blob2 == blob


def test_reference_candidate_grid():
    """find_arrays semantics (optimize.rs:16-32): integer 6-vectors in
    [-3, 3] summing to 6; decimation is deterministic."""
    full = find_predictor_vectors()
    assert all(v.shape == (6,) for v in full)
    assert all(int(v.sum()) == 6 for v in full)
    assert all(v.min() >= -3 and v.max() <= 3 for v in full)
    sub = find_predictor_vectors(limit=16)
    assert len(sub) == 16
    assert [tuple(v) for v in sub] == [
        tuple(v) for v in find_predictor_vectors(limit=16)
    ]


def test_search_returns_argmin_on_small_grid():
    """The search must return the candidate with the smallest score
    (mean |residual|), and a clearly-better vector must win: on smooth
    content the left-neighbour copy [0,0,0,6,...]/6-ish beats a
    pathological all-in-one-corner vector."""
    img = _img(seed=9)
    cands = [
        np.asarray([3.0, 3.0, 0.0, 0.0, 0.0, 0.0], np.float32),
        np.asarray([1.0, 1.0, 1.0, 1.0, 1.0, 1.0], np.float32),
        np.asarray([-3.0, 3.0, 3.0, 3.0, 0.0, 0.0], np.float32),
    ]
    best, results = search_predictors(img, "numpy", cands)
    scores = [r[0] for r in results]
    assert scores == sorted(scores)
    assert tuple(best) == tuple(results[0][2])
    # argmin really is the minimum over the evaluated grid
    by_vec = {tuple(v): s for s, _, v in results}
    assert by_vec[tuple(best)] == min(by_vec.values())
