#!/usr/bin/env python3
"""Host-loader benchmark: native C++ fastloader vs PIL.

Generates JPEGs, then times decode+letterbox through both paths.
Usage:  python tools/bench_loader.py [--n 64] [--size 416]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
from PIL import Image


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=64)
    p.add_argument('--size', type=int, default=416)
    p.add_argument('--src-size', type=int, default=640)
    args = p.parse_args()

    from multigriddet_tpu.data.annotations import (HostImageLoader,
                                                   letterbox_image)
    from multigriddet_tpu.data.native import native_available

    root = tempfile.mkdtemp(prefix='mgd_loaderbench_')
    rng = np.random.RandomState(0)
    lines = []
    for i in range(args.n):
        arr = rng.randint(0, 255,
                          (args.src_size * 3 // 4, args.src_size, 3))
        path = os.path.join(root, f'{i}.jpg')
        Image.fromarray(arr.astype('uint8')).save(path, quality=90)
        lines.append(f'{path} 10,10,100,100,0')

    hw = (args.size, args.size)

    def timeit(fn, reps=3):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps / args.n * 1000

    if native_available():
        native = HostImageLoader(lines, hw, max_boxes=4, use_native=True)
        t_native = timeit(lambda: native.load_batch(lines))
        native.close()
        print(f'native:  {t_native:.2f} ms/img')
    else:
        t_native = None
        print('native loader unavailable (make -C native)')

    pil = HostImageLoader(lines, hw, max_boxes=4, use_native=False)
    t_pil = timeit(lambda: pil.load_batch(lines))
    pil.close()
    print(f'PIL:     {t_pil:.2f} ms/img')
    if t_native:
        print(f'speedup: {t_pil / t_native:.2f}x')


if __name__ == '__main__':
    main()
