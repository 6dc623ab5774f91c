"""Multi-host data parallelism: 2 real processes on CPU, each with 2
virtual devices, one global Mesh('data') — exercises
jax.distributed.initialize, the process-sharded TrainLoader slice,
shard_batch's make_array_from_process_local_data path, AND distributed
evaluation: the in-loop EvalHook plus run_evaluation's per-process
dataset shard + cross-process result gather (reference capability:
tools/dist_train.sh multi-process DDP + DistEvalHook/multi_gpu_test's
collect_results_cpu, mmdet/apis/test.py:81-178)."""
import json
import os
import socket
import subprocess
import sys

import pytest

from test_integration import make_dataset, H, W, NUM_CLASSES



pytestmark = pytest.mark.slow

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
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug', img_scale=(%(W)d, %(H)d), flip=False,
         transforms=[
             dict(type='Resize', keep_ratio=True),
             dict(type='RandomFlip'),
             dict(type='Normalize', **img_norm),
             dict(type='Pad', size_divisor=32),
             dict(type='Collect', keys=['img']),
         ])]
classes = tuple(f'cls{c}' for c in range(%(NC)d))
cfg = Config.fromdict(dict(
    model=tiny_boxinst_cfg(),
    data=dict(samples_per_gpu=1, workers_per_gpu=1,
              train=dict(type='CocoDataset',
                         ann_file=os.environ['DATA_ROOT'] + '/ann.json',
                         img_prefix=os.environ['DATA_ROOT'] + '/images',
                         pipeline=pipeline, classes=classes),
              test=dict(type='CocoDataset',
                        ann_file=os.environ['DATA_ROOT'] + '/ann.json',
                        img_prefix=os.environ['DATA_ROOT'] + '/images',
                        pipeline=test_pipeline, classes=classes)),
    evaluation=dict(interval=2, metric=['bbox']),
    # the gather tmpdir must be shared across processes; WORK_DIR here is
    # per-process, so point it at the shared dataset root
    eval_tmpdir=os.environ['DATA_ROOT'] + '/.eval_gather',
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
test_ds = build_dataset({**cfg.data['test'], 'test_mode': True})
# in-loop distributed EvalHook fires at iter 2 on BOTH processes
# (sharded val set + gather barrier inside run_evaluation)
state = train_detector(model, dataset, cfg, validate=True,
                       val_dataset=test_ds)

# standalone distributed evaluation: every process evaluates its shard,
# process 0 gathers and scores, others get {}
from boxinstseg_tpu.apis.test import run_evaluation
metrics = run_evaluation(model, state.variables(), test_ds, cfg,
                         metrics=['bbox'], batch_size=1)
print(json.dumps({'proc': jax.process_index(),
                  'step': int(state.step),
                  'devices': jax.device_count(),
                  'eval_keys': sorted(metrics.keys()),
                  'eval_finite': all(m == m for m in metrics.values())}))
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
    by_proc = {r['proc']: r for r in results}
    # distributed eval: process 0 holds the gathered metrics, process 1
    # returns {} (reference multi_gpu_test returns results on rank 0)
    assert 'bbox_mAP' in by_proc[0]['eval_keys'], by_proc[0]
    assert by_proc[0]['eval_finite']
    assert by_proc[1]['eval_keys'] == []
