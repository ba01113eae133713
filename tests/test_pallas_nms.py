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
