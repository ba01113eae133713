"""Worker for the multi-host trainer test (run by test_distributed.py).

Each process simulates one "host" of a 2-host slice: 2 virtual CPU
devices per process, gloo cross-process collectives, and the
coordination service wired through ``environment.distributed`` in the
trainer config — i.e. the exact code path a real TPU pod-slice run
takes, minus the ICI.

Usage: python tests/_mp_trainer_worker.py <pid> <nproc> <port> <workdir>
"""

import json
import os
import sys
import time

# When spawned from inside the pytest suite, conftest's
# XLA_FLAGS=--xla_force_host_platform_device_count=8 is inherited and
# would override jax_num_cpu_devices — strip it (flags are parsed at
# backend init, so editing the env after the sitecustomize's jax import
# is still in time).
_flags = [t for t in os.environ.get('XLA_FLAGS', '').split()
          if '--xla_force_host_platform_device_count' not in t]
if not any('terminate_timeout' in t for t in _flags):
    # see conftest.py: 1-core box, avoid spurious collective aborts
    _flags.append('--xla_cpu_collective_call_terminate_timeout_seconds=600')
os.environ['XLA_FLAGS'] = ' '.join(_flags)

import jax

# The axon sitecustomize imports jax at interpreter start, so env vars
# are too late — use the config API (backends are still uninitialized).
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 2)
jax.config.update('jax_cpu_collectives_implementation', 'gloo')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(REPO, '.jax_cache'))


def make_dataset(root):
    import numpy as np
    from PIL import Image, ImageDraw
    rng = np.random.RandomState(0)
    lines = []
    for i in range(8):
        img = Image.fromarray(
            rng.randint(0, 255, (80, 96, 3)).astype('uint8'))
        d = ImageDraw.Draw(img)
        x1, y1 = rng.randint(5, 30), rng.randint(5, 25)
        x2, y2 = x1 + rng.randint(25, 50), y1 + rng.randint(25, 45)
        cls = i % 2
        d.rectangle([x1, y1, x2, y2],
                    fill=(250, 20, 20) if cls == 0 else (20, 250, 20))
        p = os.path.join(root, f'img_{i}.jpg')
        img.save(p)
        lines.append(f'{p} {x1},{y1},{x2},{y2},{cls}')
    with open(os.path.join(root, 'train.txt'), 'w') as f:
        f.write('\n'.join(lines) + '\n')
    with open(os.path.join(root, 'classes.txt'), 'w') as f:
        f.write('red\ngreen\n')
    with open(os.path.join(root, 'anchors.txt'), 'w') as f:
        f.write('40,40\n20,20\n10,10\n')


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    workdir = sys.argv[4]
    ready = os.path.join(workdir, 'READY')
    if pid == 0:
        make_dataset(workdir)
        with open(ready, 'w') as f:
            f.write('ok')
    else:
        deadline = time.time() + 120
        while not os.path.exists(ready):
            if time.time() > deadline:
                raise TimeoutError('dataset never appeared')
            time.sleep(0.2)

    config = {
        'model': {'type': 'preset', 'preset': {
            'architecture': 'multigriddet_tiny', 'num_classes': 2,
            'input_shape': [64, 64, 3],
            'anchors_path': os.path.join(workdir, 'anchors.txt'),
            'classes_path': os.path.join(workdir, 'classes.txt')}},
        'data': {
            'train_annotation': os.path.join(workdir, 'train.txt'),
            'val_annotation': os.path.join(workdir, 'train.txt'),
            'classes_path': os.path.join(workdir, 'classes.txt')},
        'training': {
            'batch_size': 4,  # GLOBAL batch -> 2 per process
            'epochs': 2, 'transfer_epochs': 1, 'freeze_level': 1,
            'learning_rate': 1e-3, 'loss_option': 2,
            'bn_recalibrate': True, 'bn_recalibrate_batches': 2,
            'augmentation': {'enabled': True, 'mosaic_prob': 0.3,
                             'mixup_prob': 0.1,
                             'max_boxes_per_image': 10}},
        'optimizer': {'type': 'adam'},
        'lr_schedule': {'type': 'cosine_annealing', 'warmup_epochs': 1},
        'callbacks': {
            'checkpoint': {'save_dir': os.path.join(workdir, 'ckpt')},
            'early_stopping': {'patience': 0}},
        'output': {'log_dir': os.path.join(workdir, f'logs'),
                   'model_dir': os.path.join(workdir, 'models')},
        'environment': {'distributed': {
            'enabled': True,
            'coordinator_address': f'localhost:{port}',
            'num_processes': nproc, 'process_id': pid}},
    }

    from multigriddet_tpu.training import MultiGridTrainer
    trainer = MultiGridTrainer(config)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()
    history = trainer.train()

    # second leg: dp x spatial 2-D mesh across the same processes —
    # batch shards across hosts, image rows shard within each host
    # (the pod recipe for large canvases); 1 epoch, no checkpoints
    cfg2 = dict(config)
    cfg2['environment'] = dict(config['environment'],
                               spatial_partition=2)
    cfg2['training'] = dict(config['training'], epochs=1,
                            transfer_epochs=0, bn_recalibrate=False)
    cfg2['callbacks'] = {}
    cfg2['output'] = {'log_dir': os.path.join(workdir, 'logs_sp'),
                      'model_dir': os.path.join(workdir, 'models_sp')}
    trainer_sp = MultiGridTrainer(cfg2)
    history_sp = trainer_sp.train()
    assert trainer_sp.mesh.shape == {'batch': 2, 'space': 2}, \
        trainer_sp.mesh.shape

    out = {
        'pid': pid,
        'process_count': jax.process_count(),
        'device_count': jax.device_count(),
        'local_batch': trainer.train_gen.batch_size,
        'train_lines': len(trainer.train_lines),
        'losses': [h['loss'] for h in history],
        'val_losses': [h.get('val_loss') for h in history],
        'steps': [h['steps'] for h in history],
        'sp_losses': [h['loss'] for h in history_sp],
    }
    with open(os.path.join(workdir, f'result_{pid}.json'), 'w') as f:
        json.dump(out, f)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
