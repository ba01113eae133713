"""Multi-host (multi-process) data-parallel training.

Single-process unit tests for the ``parallel.distributed`` helpers, plus
a slow 2-process integration test that runs the REAL ``MultiGridTrainer``
across two coordinated processes (2 virtual CPU devices each, gloo
collectives) — the pod-slice code path: ``environment.distributed``
config -> jax.distributed.initialize -> global 4-device mesh ->
per-process annotation shards -> make_array_from_process_local_data ->
GSPMD gradient/BN collectives -> host-0-gated logging and export.

The reference is single-device (SURVEY.md §2.8); this capability is
beyond-reference.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from multigriddet_tpu.parallel import (is_multiprocess, is_primary,
                                       local_batch_size, make_mesh,
                                       maybe_initialize, put_global,
                                       shard_lines)
from jax.sharding import NamedSharding, PartitionSpec as P

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestSingleProcessHelpers:
    def test_not_multiprocess(self):
        assert not is_multiprocess()
        assert is_primary()

    def test_maybe_initialize_noop_without_config(self):
        assert maybe_initialize(None) is False
        assert maybe_initialize({}) is False
        assert maybe_initialize({'enabled': 'auto'}) is False
        assert maybe_initialize({'enabled': False,
                                 'coordinator_address': 'x:1'}) is False

    def test_shard_lines_identity(self):
        lines = [f'l{i}' for i in range(10)]
        assert shard_lines(lines) == lines

    def test_local_batch_size_passthrough(self):
        assert local_batch_size(32) == 32

    def test_put_global_matches_device_put(self):
        mesh = make_mesh(jax.devices()[:4])
        x = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
        a = put_global(mesh, P('batch'), x)
        b = jax.device_put(x, NamedSharding(mesh, P('batch')))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.sharding == b.sharding


@pytest.mark.slow
def test_two_process_trainer(tmp_path):
    """Full MultiGridTrainer across 2 coordinated processes."""
    with socket.socket() as s:  # free port for the coordinator
        s.bind(('localhost', 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    worker = os.path.join(REPO, 'tests', '_mp_trainer_worker.py')

    def launch(coord_port):
        procs = [subprocess.Popen(
            [sys.executable, worker, str(pid), '2', str(coord_port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True) for pid in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        return procs, outs

    procs, outs = launch(port)
    if any(p.returncode != 0 for p in procs) and any(
            'DEADLINE_EXCEEDED' in o and 'gloo' in o for o in outs):
        # XLA's gloo KV store hardcodes a 30 s rendezvous timeout; on this
        # 1-core box a fresh-compile skew between the two timesharing
        # processes can breach it.  One retry runs from the warm
        # compilation cache, which removes the skew.
        with socket.socket() as s:
            s.bind(('localhost', 0))
            port = s.getsockname()[1]
        procs, outs = launch(port)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out[-3000:]}'

    results = []
    for pid in range(2):
        with open(tmp_path / f'result_{pid}.json') as f:
            results.append(json.load(f))
    r0, r1 = results
    assert r0['process_count'] == r1['process_count'] == 2
    assert r0['device_count'] == r1['device_count'] == 4
    # global batch 4 -> 2 per process; 8 lines -> 4 per process -> 2 steps
    assert r0['local_batch'] == r1['local_batch'] == 2
    assert r0['train_lines'] == r1['train_lines'] == 4
    assert r0['steps'] == r1['steps'] == [2, 2]
    # metrics are GLOBAL (collectives over the full batch): every
    # process must report identical losses
    np.testing.assert_allclose(r0['losses'], r1['losses'], rtol=1e-5)
    np.testing.assert_allclose(r0['val_losses'], r1['val_losses'],
                               rtol=1e-5)
    assert all(np.isfinite(v) for v in r0['losses'])
    # dp x spatial leg: batch across processes, image rows across the
    # devices within each process (the pod recipe for large canvases)
    np.testing.assert_allclose(r0['sp_losses'], r1['sp_losses'],
                               rtol=1e-5)
    assert all(np.isfinite(v) for v in r0['sp_losses'])
    # host-0-gated outputs exist exactly once
    assert (tmp_path / 'models' / 'final_model.msgpack').exists()
    hist = (tmp_path / 'logs' / 'history.jsonl').read_text().splitlines()
    assert len(hist) == 2  # one writer, not two
