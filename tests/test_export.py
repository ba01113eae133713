"""Serving export: jax.export artifact round-trip.

The artifact must reproduce the live fused-infer step exactly (same
StableHLO, weights folded in), pad small batches, chunk large ones, and
reject misuse.  Reference has no export path (inference_engine.py
rebuilds the framework to serve) — this capability is beyond-reference.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigriddet_tpu.inference.export import ServingModel, export_serving
from multigriddet_tpu.models import create_model
from multigriddet_tpu.training.steps import make_infer_step

HW = (64, 64)
NC = 3
KW = dict(confidence=0.05, max_boxes=10, pre_nms_top_k=64)


@pytest.fixture(scope='module')
def anchors():
    return [np.array([[40, 40], [20, 20], [10, 10]], np.float32) / f
            for f in (1, 2, 4)]


@pytest.fixture(scope='module')
def model_and_vars(anchors):
    model = create_model('multigriddet_tiny', num_classes=NC)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), train=False))()
    return model, variables


@pytest.fixture(scope='module')
def artifact(model_and_vars, anchors, tmp_path_factory):
    out = tmp_path_factory.mktemp('serving')
    model, variables = model_and_vars
    meta = export_serving(model, variables, anchors, HW, str(out),
                          batch_sizes=[2, 4], class_names=['a', 'b', 'c'],
                          **KW)
    return out, meta


def test_metadata(artifact):
    out, meta = artifact
    on_disk = json.loads((out / 'metadata.json').read_text())
    assert on_disk == meta
    assert meta['input_hw'] == list(HW)
    assert set(meta['programs']) == {'2', '4'}
    assert meta['class_names'] == ['a', 'b', 'c']
    assert meta['outputs'][0] == 'boxes_xywh_canvas'
    for name in meta['programs'].values():
        assert (out / name).stat().st_size > 0


def test_roundtrip_exact(artifact, model_and_vars, anchors, rng):
    out, _ = artifact
    model, variables = model_and_vars
    serving = ServingModel(str(out))
    assert serving.batch_sizes == [2, 4]
    imgs = rng.randint(0, 255, (2, *HW, 3)).astype(np.uint8)
    got = serving(imgs)
    want = make_infer_step(model, anchors, HW, **KW)(variables, imgs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_padding_and_chunking(artifact, model_and_vars, anchors, rng):
    out, _ = artifact
    model, variables = model_and_vars
    serving = ServingModel(str(out))
    step = make_infer_step(model, anchors, HW, **KW)

    # batch 1 pads to the b=2 program; result rows must match the same
    # image run padded manually through the live step
    img = rng.randint(0, 255, (1, *HW, 3)).astype(np.uint8)
    got = serving(img)
    padded = np.concatenate([img, np.zeros_like(img)], axis=0)
    want = step(variables, padded)
    for g, w in zip(got, want):
        assert g.shape[0] == 1
        np.testing.assert_allclose(g, np.asarray(w)[:1],
                                   rtol=2e-5, atol=2e-5)

    # batch 7 > max program 4: chunks as 4 + 3(pad to 4)
    imgs = rng.randint(0, 255, (7, *HW, 3)).astype(np.uint8)
    got = serving(imgs)
    assert all(g.shape[0] == 7 for g in got)
    first4 = step(variables, imgs[:4])
    np.testing.assert_allclose(got[0][:4], np.asarray(first4[0]),
                               rtol=2e-5, atol=2e-5)

    # a single unbatched image is promoted to batch 1
    got3 = serving(imgs[0])
    np.testing.assert_allclose(got3[0], got[0][:1], rtol=2e-5, atol=2e-5)


def test_rejects_bad_input_and_pallas(artifact, model_and_vars, anchors,
                                      tmp_path):
    out, _ = artifact
    serving = ServingModel(str(out))
    with pytest.raises(ValueError, match='letterbox'):
        serving(np.zeros((1, 32, 32, 3), np.uint8))
    model, variables = model_and_vars
    with pytest.raises(ValueError, match='pallas'):
        export_serving(model, variables, anchors, HW, str(tmp_path),
                       nms_backend='pallas_fused', **KW)
