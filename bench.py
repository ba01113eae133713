#!/usr/bin/env python3
"""Driver benchmark: inference + training + input-pipeline throughput.

Prints ONE JSON line.  Primary metric (BASELINE.json): images/sec/chip
@416 inference — the full fused pipeline (forward + on-device decode +
NMS at the SHIPPED defaults: pre_nms_top_k=1024, engine.py:48), bfloat16
compute, uint8 host->device transfer, per-batch host-visible results so
async dispatch can't hide work.  Extra keys carry the training step
(forward + MultiGridLoss + backward + adam, @416, b32 AND the b128
high-MFU operating point), END-TO-END real-data training (JPEGs ->
host loader -> device aug+encode -> step, overlapped, median of 3
epochs), and the input pipeline (aug + 9-cell encode @608 b8) cold /
disk-warm / RAM-warm with repeat counts + spread, so regressions in
any hot path are driver-visible.

Baseline: the reference reports ~30 FPS at 608x608 on a GTX 1060
(/root/reference/README.md:617; BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from multigriddet_tpu.models import create_model
from multigriddet_tpu.utils.anchors import DEFAULT_COCO_ANCHORS

BASELINE_FPS = 30.0  # reference: GTX 1060 @608 (README.md:617)
PEAK_BF16 = 197e12   # v5e bf16 peak FLOP/s


def _mfu(jitted, dt_per_call, *args):
    """XLA-reported FLOPs of the compiled program / v5e peak."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
        if flops > 0:
            return round(flops / dt_per_call / PEAK_BF16, 4)
    except Exception:
        pass
    return None


def bench_inference():
    """Throughput of the SHIPPED serving path.

    Builds ``MultiGridInference`` from ``configs/infer_config.yaml`` —
    the exact model ``infer.py``/``eval.py`` users get (bfloat16 compute
    by default, engine.py:_load_model) — and drives its fused program
    (forward + decode + NMS, packed single-fetch output) at b128 @416.
    Dispatches are pipelined (the engine serves with pipeline_depth 4)
    and every batch's packed detections are forced on device; the last
    is fetched to host.
    """
    batch = 128
    hw = (416, 416)
    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.inference import MultiGridInference

    config = load_config('configs/infer_config.yaml', config_type='infer')
    config.setdefault('input', {})['input_shape'] = [*hw, 3]
    engine = MultiGridInference(config)
    assert engine.compute_dtype == jnp.bfloat16, \
        'shipped serving default must be bfloat16 (VERDICT r3 #1)'
    infer, variables = engine._infer, engine.variables
    rng = np.random.RandomState(0)
    inputs = [jnp.asarray(rng.randint(0, 255, (batch, *hw, 3), np.uint8))
              for _ in range(2)]

    # two untimed calls: the first executed program in a fresh process
    # absorbs tunnel warm-up beyond compile
    from multigriddet_tpu.training.steps import fetch_detections
    for i in range(2):
        fetch_detections(infer(variables, inputs[i]))
    iters = 12
    t0 = time.time()
    outs = [infer(variables, inputs[i % 2]) for i in range(iters)]
    for o in outs:
        jax.block_until_ready(o)
    _ = fetch_detections(outs[-1])
    dt = time.time() - t0
    ips = batch * iters / dt
    return {
        'metric': 'inference_images_per_sec_416',
        'value': round(ips, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(ips / BASELINE_FPS, 2),
        'mfu_v5e_bf16': _mfu(infer, dt / iters, variables, inputs[0]),
    }


def bench_train(batch=32):
    import optax

    from multigriddet_tpu.losses import LossConfig
    from multigriddet_tpu.training.state import TrainState
    from multigriddet_tpu.training.steps import make_train_step

    hw, nc = (416, 416), 80
    rng = np.random.RandomState(0)
    model = create_model('multigriddet_darknet', num_classes=nc,
                         dtype=jnp.bfloat16)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), train=False))()
    tx = optax.adam(1e-4)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables['params'],
        batch_stats=variables['batch_stats'],
        opt_state=tx.init(variables['params']))
    images = jnp.asarray(rng.rand(batch, *hw, 3).astype(np.float32))
    ch = 3 + nc + 5
    y_true = tuple(
        jnp.asarray(rng.rand(batch, g, g, ch).astype(np.float32) * 0.01)
        for g in (hw[0] // 32, hw[0] // 16, hw[0] // 8))
    step = make_train_step(model, tx, list(DEFAULT_COCO_ANCHORS), nc, hw,
                           LossConfig(), donate=True)
    flops = None
    try:
        cost = step.lower(state, images, y_true).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0))
    except Exception:
        pass
    for _ in range(2):
        state, metrics = step(state, images, y_true)
        float(metrics['loss'])
    repeats = 8
    t0 = time.time()
    for _ in range(repeats):
        state, metrics = step(state, images, y_true)
    jax.block_until_ready(metrics['loss'])
    loss = float(metrics['loss'])
    dt = (time.time() - t0) / repeats
    out = {f'train_images_per_sec_416_b{batch}': round(batch / dt, 1),
           f'train_step_ms_b{batch}': round(dt * 1e3, 2)}
    if flops and flops > 0 and np.isfinite(loss):
        out[f'train_mfu_v5e_bf16_b{batch}'] = round(
            flops / dt / PEAK_BF16, 4)
    if batch == 32:  # legacy key names (BENCH_r01-r03 continuity)
        out['train_step_ms'] = out['train_step_ms_b32']
        if 'train_mfu_v5e_bf16_b32' in out:
            out['train_mfu_v5e_bf16'] = out['train_mfu_v5e_bf16_b32']
    return out


def _last_json_line(proc) -> str:
    """Last JSON stdout line of a bench subprocess, or a RuntimeError
    carrying the child's actual failure (returncode + stderr tail)
    instead of an IndexError on empty output."""
    lines = [l for l in proc.stdout.splitlines() if l.startswith('{')]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f'bench subprocess failed (rc={proc.returncode}): '
            f'{proc.stderr[-800:]}')
    return lines[-1]


def bench_train_e2e():
    """Real-data end-to-end training throughput (VERDICT r3 #3).

    JPEGs on disk -> HostImageLoader -> on-device aug + 9-cell encode ->
    train step, overlapped and sustained over full epochs — the system
    ``train.py`` actually runs.  Clean subprocess for the same reason as
    bench_pipeline: a second jax client in this parent degrades the
    child's host pipeline.
    """
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, 'tools', 'bench_train_e2e.py'),
         '32', '416', '3'],
        capture_output=True, text=True, timeout=1800, cwd=repo)
    got = json.loads(_last_json_line(proc))
    # The HEADLINE e2e keys report the SHIPPED DEFAULT path: the fused
    # single-program step (training.fused_input_stage, default on) over
    # the HBM image bank (cache_images_device: true in the recommended
    # config) — epoch >= 2 steady state, where the host link carries
    # only boxes + row indices.  The host-streaming path (what r4's
    # headline measured; the operating point for datasets that exceed
    # the HBM bank budget) stays visible as the _stream keys; it is
    # link-bound, so read it next to the link_* keys.
    out = {
        'train_e2e_stream_images_per_sec': got['e2e_img_per_s'],
        'train_e2e_stream_images_per_sec_min': got['e2e_img_per_s_min'],
        'train_e2e_stream_images_per_sec_max': got['e2e_img_per_s_max'],
        'train_e2e_stream_over_pure_step': got['e2e_over_pure'],
    }
    # HBM image-bank steady state (cache_images_device): epoch >= 2
    # gathers pixels on device; host link carries only boxes + indices
    if 'hbm_img_per_s' in got:
        out['train_e2e_hbm_images_per_sec'] = got['hbm_img_per_s']
        out['train_e2e_hbm_over_pure_step'] = got['hbm_over_pure']
    # fused single-program path (make_fused_train_step over the HBM
    # bank): aug + encode + forward + backward + update, ONE dispatch
    if 'fused_img_per_s' in got:
        out['train_e2e_images_per_sec'] = got['fused_img_per_s']
        out['train_e2e_over_pure_step'] = got['fused_over_pure']
        out['train_e2e_fused_images_per_sec'] = got['fused_img_per_s']
        out['train_e2e_fused_over_pure_step'] = got['fused_over_pure']
    # b128 operating point, fused leg only (VERDICT r4 #7): the
    # recommended config's b128 guidance must rest on an END-TO-END
    # number, not the step-only 0.50-MFU one
    try:
        proc = subprocess.run(
            [sys.executable,
             os.path.join(repo, 'tools', 'bench_train_e2e.py'),
             '128', '416', '2', 'fused'],
            capture_output=True, text=True, timeout=1800, cwd=repo)
        got128 = json.loads(_last_json_line(proc))
        out['train_e2e_fused_b128_images_per_sec'] = \
            got128['fused_img_per_s']
        out['train_e2e_fused_b128_over_pure_step'] = \
            got128['fused_over_pure']
    except Exception as exc:
        out['train_e2e_b128_error'] = f'{type(exc).__name__}'
    return out


def bench_pipeline():
    # clean subprocess: sharing the process with the inference/train
    # benches measurably degrades the host pipeline (3-10x slower than
    # the same code standalone), so measure it the way it actually runs
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, 'tools', 'bench_pipeline.py'),
         'both', 'cold,disk,ram,hbm'],
        capture_output=True, text=True, timeout=2400, cwd=repo)
    got = json.loads(_last_json_line(proc))
    out = {
        'pipeline_sps_cold': got['ours_sps_cold'],
        'pipeline_sps_diskwarm': got['ours_sps_disk'],
        'pipeline_sps_ramwarm': got['ours_sps_ram'],
        'pipeline_repeats': got.get('ours_sps_ram_n'),
    }
    # the reference tf.data side, measured in the SAME subprocess on the
    # SAME host, so the >=5x BASELINE.md target is driver-visible as a
    # ratio rather than asserted against a one-time recording
    if 'reference_sps' in got:
        out['pipeline_reference_sps'] = got['reference_sps']
        out['pipeline_vs_reference'] = round(
            got['ours_sps_ram'] / got['reference_sps'], 2)
    if 'ours_sps_hbm' in got:
        out['pipeline_sps_hbm'] = got['ours_sps_hbm']
        if 'reference_sps' in got:
            out['pipeline_hbm_vs_reference'] = round(
                got['ours_sps_hbm'] / got['reference_sps'], 2)
    # spread makes single-run instability driver-visible (VERDICT r3 #2)
    for mode, key in (('disk', 'diskwarm'), ('ram', 'ramwarm')):
        for stat in ('min', 'max'):
            v = got.get(f'ours_sps_{mode}_{stat}')
            if v is not None:
                out[f'pipeline_sps_{key}_{stat}'] = v
    return out


def bench_link():
    """Host<->device link probe (tools/measure_link.py), subprocess.

    The tunneled link's bandwidth varies >100x day to day (measured
    1.0 GB/s on the r3 run, 0.15 on r4, 0.005 the day after — same
    code); every streaming number in this file is link-bound, so the
    link the host actually had must ride in the same JSON line.
    """
    import os
    import subprocess
    import sys
    repo = os.path.dirname(os.path.abspath(__file__))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, 'tools', 'measure_link.py'),
         '4'],
        capture_output=True, text=True, timeout=600, cwd=repo)
    got = json.loads(_last_json_line(proc))
    return {'link_h2d_gbps_9mb': got['h2d_gbps_9mb'],
            'link_d2h_gbps_9mb': got['d2h_gbps_9mb'],
            'link_rtt_ms': got['rtt_ms']}


def main():
    # pipeline FIRST: its subprocess needs the TPU, and once this parent
    # initializes its own client (first device use in bench_inference)
    # the child's jitted aug+encode program degrades ~30-60x (measured:
    # disk-warm 444.8 -> 7.3 samples/s).  Nothing in this process touches
    # a device before bench_inference, so the child gets the chip cleanly.
    pipeline = {}
    try:
        pipeline = bench_pipeline()
    except Exception as exc:
        pipeline = {'bench_pipeline_error': f'{type(exc).__name__}'}
    link = {}
    try:
        link = bench_link()
    except Exception as exc:
        link = {'bench_link_error': f'{type(exc).__name__}'}
    e2e = {}
    try:
        e2e = bench_train_e2e()
    except Exception as exc:
        e2e = {'bench_train_e2e_error': f'{type(exc).__name__}'}
    result = bench_inference()
    for batch in (32, 128):
        try:
            result.update(bench_train(batch))
        except Exception as exc:  # keep the primary metric alive
            result[f'bench_train_b{batch}_error'] = f'{type(exc).__name__}'
    result.update(e2e)
    result.update(pipeline)
    result.update(link)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
