#!/usr/bin/env python3
"""Host<->device link bandwidth probe.

The streaming input pipeline's steady state moves one decoded u8 batch
per step over the host->device link (8.9 MB at b8 @608).  On this
tunneled single-chip setup the link's bandwidth is not a constant: the
round-3 RAM-warm pipeline measured 813-976 samples/s (~1.1 GB/s of
h2d traffic) while round 4's driver run measured ~130 (~0.14 GB/s) —
same code.  This probe measures the link directly so a pipeline number
can always be normalized by the link the host actually had that day
(docs/STATUS.md round 5; VERDICT r4 #2 reconciliation).

Usage: python tools/measure_link.py [mb=32] [reps=8]
Prints one JSON line {h2d_gbps, d2h_gbps, rtt_ms, device}.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    dev = jax.devices()[0]
    n = MB << 20
    host = np.random.RandomState(0).randint(0, 255, n, np.uint8)
    # warm both directions + the allocator
    d = jax.device_put(host, dev)
    jax.block_until_ready(d)
    np.asarray(d)

    t0 = time.time()
    for _ in range(REPS):
        jax.block_until_ready(jax.device_put(host, dev))
    h2d = MB * REPS / (time.time() - t0) / 1024

    t0 = time.time()
    for _ in range(REPS):
        np.asarray(d)
    d2h = MB * REPS / (time.time() - t0) / 1024

    # dispatch round-trip: a trivial program on a scalar, forced
    one = jnp.ones(())
    f = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f(one))
    t0 = time.time()
    for _ in range(32):
        jax.block_until_ready(f(one))
    rtt_ms = (time.time() - t0) / 32 * 1e3

    print(json.dumps({
        'metric': 'host_device_link',
        'h2d_gbps': round(h2d, 3),
        'd2h_gbps': round(d2h, 3),
        'rtt_ms': round(rtt_ms, 2),
        'mb': MB,
        'device': str(dev.platform),
    }))


if __name__ == '__main__':
    main()
