"""Detection-level cross-framework parity via the reference's own builder.

Runs tools/crossframework_parity.py (reference ``build_multigriddet_darknet``
built verbatim -> weights ported -> both frameworks end to end on the
reference's example images) on a 2-image subset.  The committed full-run
report lives in docs/CROSSFRAMEWORK_PARITY.md.
"""

import importlib.util
import os

import pytest

tf = pytest.importorskip('tensorflow')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_crossframework_detection_parity(monkeypatch):
    if not os.path.isdir('/root/reference/examples/images'):
        pytest.skip('reference example images not available')
    monkeypatch.setenv('PARITY_IMAGES', '2')
    spec = importlib.util.spec_from_file_location(
        'crossframework_parity',
        os.path.join(REPO, 'tools', 'crossframework_parity.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # main() asserts logit_max < 1e-4, control (reference postprocess on
    # OUR logits) match >= 93%, and end-to-end detection match >= 90%
    # (under pytest the forward runs on the virtual CPU mesh, whose
    # numerics shift the near-boundary churn a few percent vs the
    # committed full-TPU report's 98.8%)
    mod.main()
