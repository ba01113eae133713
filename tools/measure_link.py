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

Methodology notes: d2h times FRESH device arrays (jax caches an
array's host copy after its first fetch, so re-fetching one array
measures nothing), and h2d is reported per transfer size — the
pipeline's operating point is the ~9 MB batch.

Usage: python tools/measure_link.py [reps=6]
Prints one JSON line {h2d_gbps_<mb>mb..., d2h_gbps, rtt_ms}.
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

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
SIZES_MB = (1, 9, 32)


def main():
    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    out = {'metric': 'host_device_link', 'device': str(dev.platform),
           'reps': REPS}

    # warm the allocator + tunnel
    warm = jax.device_put(rng.randint(0, 255, 1 << 20, np.uint8), dev)
    jax.block_until_ready(warm)
    np.asarray(warm)

    for mb in SIZES_MB:
        n = mb << 20
        # distinct host buffers so no source-side caching can help
        hosts = [rng.randint(0, 255, n, np.uint8) for _ in range(2)]
        jax.block_until_ready(jax.device_put(hosts[0], dev))
        t0 = time.time()
        for i in range(REPS):
            jax.block_until_ready(jax.device_put(hosts[i % 2], dev))
        out[f'h2d_gbps_{mb}mb'] = round(
            mb * REPS / (time.time() - t0) / 1024, 3)

    # d2h: REPS fresh device arrays (first fetch each — no host cache)
    mb = 9
    n = mb << 20
    devs = [jax.device_put(rng.randint(0, 255, n, np.uint8), dev)
            for _ in range(REPS)]
    jax.block_until_ready(devs)
    t0 = time.time()
    for d in devs:
        np.asarray(d)
    out['d2h_gbps_9mb'] = round(mb * REPS / (time.time() - t0) / 1024, 3)

    # dispatch round-trip: a trivial program on a scalar, forced
    one = jnp.ones(())
    f = jax.jit(lambda x: x + 1)
    jax.block_until_ready(f(one))
    t0 = time.time()
    for _ in range(32):
        jax.block_until_ready(f(one))
    out['rtt_ms'] = round((time.time() - t0) / 32 * 1e3, 2)

    print(json.dumps(out))


if __name__ == '__main__':
    main()
