#!/usr/bin/env python3
"""Does XLA:TPU map int8 convolution to the MXU at 2x bf16 throughput?

v5e lists 394 TOPS int8 vs 197 TFLOPS bf16.  If an s8 x s8 -> s32 conv
actually reaches ~2x bf16 wall-clock, an int8 PTQ serving path is worth
building; if XLA upcasts (or runs it on the VPU), it is not.

Usage: python tools/bench_int8_conv.py
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

LOOP = 32


def timed(make_prog, x, w, repeats=3):
    # the body must reference the JIT PARAMETERS (xa/wa), not the outer
    # arrays — closing over x/w would bake the 44-64 MB operands into
    # the executable as constants and leave the traced args dead
    def run(xa, wa):
        def body(i, s):
            # perturb the input by the loop counter so the conv is NOT
            # loop-invariant (XLA hoists an unperturbed body to one call)
            xp = xa + (i % 2).astype(xa.dtype)
            out = make_prog(xp, wa)
            return s + jnp.reshape(out, (-1,))[0].astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    jitted = jax.jit(run)
    for _ in range(2):
        float(jitted(x, w))
    t0 = time.time()
    outs = [jitted(x, w) for _ in range(repeats)]
    _ = sum(float(o) for o in outs)
    return (time.time() - t0) / repeats / LOOP


def main():
    rng = np.random.RandomState(0)
    # representative mid-network shape: 26x26x512 -> 3x3x1024, b128
    B, H, W, C, O, KH = 128, 26, 26, 512, 1024, 3
    flops = 2 * B * H * W * C * O * KH * KH

    x8 = jnp.asarray(rng.randint(-127, 127, (B, H, W, C)), jnp.int8)
    w8 = jnp.asarray(rng.randint(-127, 127, (KH, KH, C, O)), jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)

    dn = jax.lax.conv_dimension_numbers(
        x8.shape, w8.shape, ('NHWC', 'HWIO', 'NHWC'))

    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.float32)

    try:
        t8 = timed(conv_i8, x8, w8)
        print(f'int8  conv: {t8*1e3:7.2f} ms  {flops/t8/1e12:6.1f} TOP/s')
    except Exception as e:
        print(f'int8  conv: FAILED ({type(e).__name__}: {e})')
        t8 = None
    tb = timed(conv_bf16, xb, wb)
    print(f'bf16  conv: {tb*1e3:7.2f} ms  {flops/tb/1e12:6.1f} TFLOP/s')
    if t8:
        print(f'speedup int8/bf16: {tb/t8:.2f}x')

    # matmul control: 8192x8192x8192
    N = 8192
    a8 = jnp.asarray(rng.randint(-127, 127, (N, N)), jnp.int8)
    b8 = jnp.asarray(rng.randint(-127, 127, (N, N)), jnp.int8)
    mm_flops = 2 * N * N * N

    def mm_i8(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    def mm_bf(a, b):
        return jax.lax.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

    try:
        t = timed(mm_i8, a8, b8)
        print(f'int8  mm  : {t*1e3:7.2f} ms  {mm_flops/t/1e12:6.1f} TOP/s')
    except Exception as e:
        print(f'int8  mm  : FAILED ({type(e).__name__}: {e})')
    t = timed(mm_bf, a8, b8)
    print(f'bf16  mm  : {t*1e3:7.2f} ms  {mm_flops/t/1e12:6.1f} TFLOP/s')


if __name__ == '__main__':
    main()
