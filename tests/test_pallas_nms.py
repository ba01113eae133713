"""Pallas NMS kernel parity vs the XLA greedy sweep (interpret mode on the
CPU mesh; the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multigriddet_tpu.ops.nms import _greedy_sweep, _overlap_matrix
from multigriddet_tpu.ops.pallas_nms import pallas_greedy_nms


@pytest.mark.parametrize('method,use_iol', [
    ('standard', False), ('standard', True), ('diou', True)])
def test_pallas_matches_xla_sweep(rng, method, use_iol):
    k = 128
    xy = rng.rand(k, 2).astype(np.float32) * 200
    wh = rng.rand(k, 2).astype(np.float32) * 80 + 5
    boxes = jnp.asarray(np.concatenate([xy, wh], -1))
    valid = jnp.asarray(rng.rand(k) > 0.1)

    overlap = _overlap_matrix(boxes, method, use_iol)
    want = np.asarray(_greedy_sweep(overlap, valid, 0.45))
    got = np.asarray(pallas_greedy_nms(boxes, valid, 0.45, method, use_iol,
                                       interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_nms_degenerate(rng):
    k = 64
    boxes = jnp.zeros((k, 4))
    valid = jnp.zeros((k,), bool)
    got = np.asarray(pallas_greedy_nms(boxes, valid, 0.5, interpret=True))
    assert not got.any()


@pytest.mark.parametrize('method,use_iol', [
    ('standard', False), ('standard', True), ('diou', True)])
def test_popmax_fused_matches_xla_full_pool(rng, method, use_iol):
    """backend='pallas_fused' (pop-max over the untruncated pool) returns
    the exact keep set, order, boxes, classes, and scores of the XLA path
    run with pre_nms_top_k=N — including under exact score ties."""
    from multigriddet_tpu.ops.nms import batched_nms
    b, n = 2, 300
    boxes = rng.rand(b, n, 4).astype(np.float32) * 300
    boxes[..., 2:] = rng.rand(b, n, 2).astype(np.float32) * 90 + 5
    scores = rng.rand(b, n).astype(np.float32)
    scores[:, 50:60] = scores[:, 40:50]       # exact-tie armies
    classes = rng.randint(0, 20, (b, n)).astype(np.int32)
    args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes))
    kw = dict(confidence=0.05, nms_threshold=0.45, max_boxes=50,
              pre_nms_top_k=n, nms_method=method, use_iol=use_iol)
    rbx, rcl, rsc, rva = batched_nms(*args, **kw)
    gbx, gcl, gsc, gva = batched_nms(*args, **kw, backend='pallas_fused')
    v = np.asarray(rva)
    np.testing.assert_array_equal(v, np.asarray(gva))
    np.testing.assert_array_equal(np.where(v, np.asarray(rcl), 0),
                                  np.where(v, np.asarray(gcl), 0))
    np.testing.assert_allclose(np.where(v, np.asarray(rsc), 0),
                               np.where(v, np.asarray(gsc), 0), atol=1e-6)
    np.testing.assert_allclose(np.where(v[..., None], np.asarray(rbx), 0),
                               np.where(v[..., None], np.asarray(gbx), 0),
                               atol=1e-5)


def test_popmax_fused_empty_and_below_confidence(rng):
    from multigriddet_tpu.ops.nms import batched_nms
    b, n = 1, 200
    boxes = rng.rand(b, n, 4).astype(np.float32) * 100 + 1
    scores = np.full((b, n), 0.01, np.float32)   # all below confidence
    classes = np.zeros((b, n), np.int32)
    _, _, _, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        0.1, 0.45, max_boxes=20, backend='pallas_fused')
    assert not np.asarray(valid).any()
