#!/usr/bin/env python3
"""Per-conv-shape fwd/dgrad/wgrad efficiency on the chip (bf16, NHWC).

Times every distinct conv shape in the Darknet53 flagship @416 (stem,
stage downsamples, bottleneck 1x1/3x3 pairs, head convs) as three
standalone programs — forward, input-gradient (dgrad), and
filter-gradient (wgrad) — and reports each against the analytic FLOP
count, attributing the training-MFU gap (bench_train 0.33 @b32 vs 0.60
inference fwd @b128) to specific layers and directions.

Through the axon tunnel a single op call costs ~29.5 ms round-trip, so
each timed program runs the op N times inside one ``lax.fori_loop``,
serialized by a data dependence XLA cannot hoist (the loop carry
perturbs the weights by a runtime ~1e-30 scalar derived from the
previous output).  Per-op time = (program wall - null-program wall) /
N, where the null program measures the dispatch+RTT floor.  N is
calibrated PER SHAPE so every program does ~TARGET_MS of in-program
work — a fixed loop count buries the fast 1x1 shapes (~0.05 ms/op) in
the ~±3 ms jitter of the RTT floor.

Usage: python tools/bench_conv_shapes.py [BATCH] [SIDE] [TARGET_MS]
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SIDE = int(sys.argv[2]) if len(sys.argv) > 2 else 416
TARGET_MS = float(sys.argv[3]) if len(sys.argv) > 3 else 250.0
PEAK_BF16 = 197e12
S = SIDE


def shapes():
    # (name, in_hw, cin, cout, k, stride, count) — count = occurrences in
    # the flagship so totals can weight each shape by its FLOP share.
    out = [('stem', S, 3, 32, 3, 1, 1)]
    hw = S
    cin = 32
    for filt, blocks in [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]:
        out.append((f'down{filt}', hw, cin, filt, 3, 2, 1))
        hw //= 2
        out.append((f'b{filt}_1x1', hw, filt, filt // 2, 1, 1, blocks))
        out.append((f'b{filt}_3x3', hw, filt // 2, filt, 3, 1, blocks))
        cin = filt
    g = S // 32
    for width, grid in ((1024, g), (512, g * 2), (256, g * 4)):
        out.append((f'head{width}_1x1', grid, width, width // 2, 1, 1, 3))
        out.append((f'head{width}_3x3', grid, width // 2, width, 3, 1, 2))
    return out


def timed_looped(op, x, w, base, repeats=3):
    """Per-op wall time: N serialized calls inside one program.

    ``op(x, w, s)`` must make its output depend on the runtime-tiny
    scalar ``s`` (~1e-30; numerically a no-op) so XLA's loop-invariant
    code motion cannot hoist it out of the ``fori_loop``.  An 8-iter
    calibration run sizes N so the real run does ~TARGET_MS of
    in-program work (power-of-two, capped at 8192).
    """

    def make(loop):
        @jax.jit
        def prog(x, w):
            def body(i, s):
                out = op(x, w, s)
                # feed a runtime-tiny scalar back into the next
                # iteration: serializes the loop.  The reduction covers
                # the ENTIRE output — reducing a slice lets XLA push the
                # slice into the conv (compute 1 of Cout channels) and
                # report garbage.  The full-output min adds ~one read
                # pass over the output, small vs the 3x3 shapes, a
                # measurable overestimate on the bandwidth-bound 1x1s.
                return jnp.min(out).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, loop, body, jnp.float32(0.0))
        return prog

    cal = make(8)
    for _ in range(2):
        float(cal(x, w))
    t0 = time.time()
    float(cal(x, w))
    est = max((time.time() - t0 - base) / 8, 1e-7)
    loop = int(2 ** np.ceil(np.log2(
        min(max(TARGET_MS / 1e3 / est, 8), 8192))))
    prog = make(loop)
    for _ in range(2):
        float(prog(x, w))
    t0 = time.time()
    outs = [prog(x, w) for _ in range(repeats)]
    _ = [float(o) for o in outs]
    return max((time.time() - t0) / repeats - base, 1e-9) / loop


def null_wall(repeats=10):
    @jax.jit
    def prog(s):
        return jax.lax.fori_loop(0, 64, lambda i, a: a * 0.9999 + 1e-6, s)

    for _ in range(2):
        float(prog(jnp.float32(1.0)))
    t0 = time.time()
    outs = [prog(jnp.float32(1.0)) for _ in range(repeats)]
    _ = [float(o) for o in outs]
    return (time.time() - t0) / repeats


def main():
    rng = np.random.RandomState(0)
    base = null_wall()
    print(f'null program wall (dispatch+RTT floor): {base * 1e3:.2f} ms')
    rows = []
    totals = {'fwd': 0.0, 'dgrad': 0.0, 'wgrad': 0.0}
    tflops = {'fwd': 0.0, 'dgrad': 0.0, 'wgrad': 0.0}
    for name, hw, cin, cout, k, stride, count in shapes():
        x = jnp.asarray(rng.rand(B, hw, hw, cin).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.rand(k, k, cin, cout).astype(np.float32) * .01,
                        jnp.bfloat16)
        pad = 'SAME' if stride == 1 else [(k // 2, k // 2)] * 2

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), pad,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        out_hw = hw // stride if stride == 2 else hw
        flops = 2.0 * B * out_hw * out_hw * k * k * cin * cout

        # The loop-carried dependence must be NON-FACTORABLE: conv is
        # linear in both operands, so any scale/add perturbation
        # (w*(1+s), w+s, cotangent*(1+s)) gets algebraically pulled out
        # of the conv and the conv hoisted as loop-invariant (measured:
        # "convs" at 340 TF/s).  maximum(w, s - 1e38) is a runtime
        # no-op XLA cannot factor through the conv.  fwd and dgrad
        # depend on w, wgrad only on x and the cotangent — so the
        # cotangent carries its dependence (one out-sized materialized
        # buffer; a mild overestimate for the bandwidth-bound 1x1s).
        def pert(a, s):
            return jnp.maximum(a, (s - 1e38).astype(a.dtype))

        def fwd_op(x, w, s):
            return conv(x, pert(w, s))

        def dgrad_op(x, w, s):
            return jax.grad(lambda x: jnp.sum(
                conv(x, pert(w, s)).astype(jnp.float32)))(x)

        def wgrad_op(x, w, s):
            out, vjp = jax.vjp(lambda w: conv(x, w), w)
            g = pert(jnp.full(out.shape, 1.0, out.dtype), s)
            return vjp(g)[0]

        ts = [timed_looped(op, x, w, base)
              for op in (fwd_op, dgrad_op, wgrad_op)]
        rows.append((name, hw, cin, cout, k, stride, count, flops, *ts))
        for key, dt in zip(('fwd', 'dgrad', 'wgrad'), ts):
            totals[key] += dt * count
            tflops[key] += flops * count

    print(f'batch={B} side={SIDE} target={TARGET_MS:.0f}ms bf16 NHWC  '
          f'(mfu = analytic '
          f'flops / {PEAK_BF16 / 1e12:.0f} TF/s peak)')
    print(f'{"shape":<14}{"hw":>5}{"cin":>5}{"cout":>5}{"k":>3}{"s":>3}'
          f'{"n":>3}{"gflop":>8}'
          f'{"fwd ms":>8}{"mfu":>6}{"dgrad":>8}{"mfu":>6}'
          f'{"wgrad":>8}{"mfu":>6}')
    for (name, hw, cin, cout, k, stride, count, flops, tf, td, tw) in rows:
        mf = [flops / dt / PEAK_BF16 for dt in (tf, td, tw)]
        print(f'{name:<14}{hw:>5}{cin:>5}{cout:>5}{k:>3}{stride:>3}'
              f'{count:>3}{flops / 1e9:>8.2f}'
              f'{tf * 1e3:>8.3f}{mf[0]:>6.2f}{td * 1e3:>8.3f}{mf[1]:>6.2f}'
              f'{tw * 1e3:>8.3f}{mf[2]:>6.2f}')
    print('\nweighted totals (shape x count, standalone-program times):')
    for key in ('fwd', 'dgrad', 'wgrad'):
        print(f'  {key:<6} {totals[key] * 1e3:>8.2f} ms   mfu '
              f'{tflops[key] / totals[key] / PEAK_BF16:.3f}')


if __name__ == '__main__':
    main()
