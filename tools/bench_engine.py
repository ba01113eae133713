#!/usr/bin/env python3
"""End-to-end serving throughput through MultiGridInference.detect_batch.

Measures the full product path — PIL in, original-pixel detections out:
host letterbox + uint8 transfer + fused device program + host
letterbox-inverse — and A/Bs the shipped depth-2 software pipeline
against a serialized loop (preprocess → dispatch → force → postprocess
per chunk, the pre-pipelining behavior).

Usage: python tools/bench_engine.py [n_images] [batch_size]
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(REPO, '.jax_cache'))

import jax.numpy as jnp  # noqa: E402
from PIL import Image  # noqa: E402


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from multigriddet_tpu.config import load_config
    from multigriddet_tpu.inference import MultiGridInference

    config = load_config(os.path.join(REPO, 'configs/infer_config.yaml'),
                         config_type='infer')
    engine = MultiGridInference(config)
    # smooth synthetic photos (noise JPEGs decode pathologically slowly)
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    images = []
    for _ in range(n_images):
        a, b, c = rng.rand(3) * 0.02
        base = (127 + 100 * np.sin(a * xx + b * yy + c * 100))
        img = np.stack([base, base[::-1], base[:, ::-1]],
                       axis=-1).clip(0, 255).astype(np.uint8)
        for _ in range(4):
            x1, y1 = rng.randint(0, 560), rng.randint(0, 400)
            img[y1:y1 + 60, x1:x1 + 60] = rng.randint(0, 255, 3)
        images.append(Image.fromarray(img))

    def serialized(imgs):
        """The pre-pipelining behavior: force each chunk before the next."""
        from multigriddet_tpu.data.annotations import letterbox_image
        from multigriddet_tpu.ops.geometry import canvas_boxes_to_image
        results = []
        for start in range(0, len(imgs), batch_size):
            chunk = imgs[start:start + batch_size]
            batch = np.zeros((batch_size, *engine.input_hw, 3), np.uint8)
            sizes = []
            for i, img in enumerate(chunk):
                arr, _, _, _ = letterbox_image(img.convert('RGB'),
                                               engine.input_hw)
                batch[i] = arr
                sizes.append((img.size[1], img.size[0]))
            from multigriddet_tpu.training.steps import fetch_detections
            outs = engine._infer(engine.variables, jnp.asarray(batch))
            bxs, cls, scs, valid = fetch_detections(outs)
            for i, (ih, iw) in enumerate(sizes):
                keep = valid[i]
                b, c, s = bxs[i][keep], cls[i][keep], scs[i][keep]
                if len(b):
                    b = np.asarray(canvas_boxes_to_image(
                        b, (ih, iw), engine.input_hw))
                results.append((b, c, s))
        return results

    # file-based path: native C++ decode+letterbox -> device
    import tempfile
    tmpdir = tempfile.mkdtemp(prefix='bench_engine_')
    paths = []
    for i, img in enumerate(images):
        p = os.path.join(tmpdir, f'{i:04d}.jpg')
        img.save(p, quality=90)
        paths.append(p)

    # all paths serve FROM FILES so decode cost is comparable; fresh
    # lazy PIL handles per pass (decode happens inside the timed loop,
    # as a file-serving deployment would pay it)
    def pil_handles():
        return [Image.open(p) for p in paths]

    # warm all paths (compile + tunnel warm-up)
    engine.detect_batch(pil_handles()[:2 * batch_size], batch_size)
    serialized(pil_handles()[:2 * batch_size])
    engine.detect_files(paths[:2 * batch_size], batch_size)

    # this 1-core box shows +-30% run-to-run variance on host-bound
    # paths; interleave 3 passes of each and report medians
    def median(f, check):
        dts = []
        for _ in range(3):
            t0 = time.time()
            r = f()
            dts.append(time.time() - t0)
            assert len(r) == check
        return sorted(dts)[1]

    dt_ser = median(lambda: serialized(pil_handles()), n_images)
    dt_pipe = median(lambda: engine.detect_batch(pil_handles(),
                                                 batch_size), n_images)
    dt_file = median(lambda: engine.detect_files(paths, batch_size),
                     n_images)
    print(f'PIL serialized:      {n_images / dt_ser:7.1f} img/s  '
          f'({dt_ser:.2f}s median of 3)')
    print(f'PIL pipelined:       {n_images / dt_pipe:7.1f} img/s  '
          f'({dt_pipe:.2f}s)  {dt_ser / dt_pipe:.2f}x')
    print(f'native detect_files: {n_images / dt_file:7.1f} img/s  '
          f'({dt_file:.2f}s)  {dt_ser / dt_file:.2f}x')


if __name__ == '__main__':
    main()
