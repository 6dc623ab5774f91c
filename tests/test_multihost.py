"""Multi-host data parallelism: 2 real processes on CPU, each with 2
virtual devices, one global Mesh('data') — exercises
jax.distributed.initialize, the process-sharded TrainLoader slice, and
shard_batch's make_array_from_process_local_data path end-to-end through
tools/train.py (reference capability: tools/dist_train.sh multi-process
DDP)."""
import json
import os
import socket
import subprocess
import sys

import pytest

from test_integration import make_dataset, H, W, NUM_CLASSES


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


WORKER = r'''
import os, sys, json
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=2')
import jax
jax.config.update('jax_platforms', 'cpu')
sys.path.insert(0, os.environ['REPO_ROOT'])
sys.path.insert(0, os.path.join(os.environ['REPO_ROOT'], 'tests'))

from boxinstseg_tpu.parallel import init_distributed
assert init_distributed()                  # env-driven
assert jax.process_count() == 2
assert jax.device_count() == 4             # 2 procs x 2 cpu devices

from boxinstseg_tpu.config import Config
from boxinstseg_tpu.registry import build_dataset, build_detector
from boxinstseg_tpu.apis.train import train_detector
from test_boxinst_model import tiny_boxinst_cfg

img_norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True)
pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations', with_bbox=True, with_mask=False),
    dict(type='Resize', img_scale=(%(W)d, %(H)d), keep_ratio=True),
    dict(type='Normalize', **img_norm),
    dict(type='Pad', size_divisor=32),
    dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels']),
]
classes = tuple(f'cls{c}' for c in range(%(NC)d))
cfg = Config.fromdict(dict(
    model=tiny_boxinst_cfg(),
    data=dict(samples_per_gpu=1, workers_per_gpu=1,
              train=dict(type='CocoDataset',
                         ann_file=os.environ['DATA_ROOT'] + '/ann.json',
                         img_prefix=os.environ['DATA_ROOT'] + '/images',
                         pipeline=pipeline, classes=classes)),
    optimizer=dict(type='SGD', lr=0.002, momentum=0.9, weight_decay=1e-4),
    lr_config=dict(policy='step', step=[100], warmup=None),
    runner=dict(type='IterBasedRunner', max_iters=2),
    checkpoint_config=dict(interval=100, by_epoch=False),
    log_config=dict(interval=1),
    canvases=[(%(H)d, %(W)d)],
    max_gts=8, seed=0,
    work_dir=os.environ['WORK_DIR'],
))
model = build_detector(cfg.model.copy())
dataset = build_dataset(cfg.data['train'])
state = train_detector(model, dataset, cfg)
print(json.dumps({'proc': jax.process_index(),
                  'step': int(state.step),
                  'devices': jax.device_count()}))
'''


def test_two_process_data_parallel_training(tmp_path):
    make_dataset(str(tmp_path))
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = WORKER % dict(W=W, H=H, NC=NUM_CLASSES)

    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   REPO_ROOT=repo,
                   DATA_ROOT=str(tmp_path),
                   WORK_DIR=str(tmp_path / f'work{pid}'),
                   JAX_COORDINATOR_ADDRESS=f'127.0.0.1:{port}',
                   JAX_NUM_PROCESSES='2',
                   JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, '-c', script], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=540) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out}\n{err[-3000:]}'
    results = [json.loads(out.strip().splitlines()[-1])
               for out, _ in outs]
    assert {r['proc'] for r in results} == {0, 1}
    assert all(r['step'] == 2 and r['devices'] == 4 for r in results)
