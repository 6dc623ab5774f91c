"""Per-op TPU profile of a family's jitted train step.

Captures a ``jax.profiler`` trace of a few steady-state steps of the
family's shipped recipe (same setup as bench.py) and prints the top HLO
ops by device self-time via xprof's ``hlo_stats`` tool — the TPU
equivalent of the reference's CUDA-event ``profile_time``
(reference: mmdet/utils/profiling.py:10-40 + tools/analysis_tools/
benchmark.py FPS loop).

Usage:
    BENCH_MODEL=box2mask python tools/analysis_tools/tpu_profile.py \
        [--steps 3] [--top 45] [--group]

``--group`` aggregates by (category, source line) instead of single ops.
"""
import argparse
import glob
import gzip
import io
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, ROOT)


def capture(steps: int, logdir: str):
    """bench.py's setup, but traced instead of timed."""
    import bench
    import jax

    # reuse bench's main-path construction by monkeypatching its timing
    # region is more fragile than rebuilding; rebuild via its module
    # globals instead.
    import jax.numpy as jnp
    import boxinstseg_tpu  # noqa: F401
    from boxinstseg_tpu.config import Config
    from boxinstseg_tpu.registry import build_detector
    from boxinstseg_tpu.engine import (build_optimizer, create_train_state,
                                       init_variables, make_train_step,
                                       make_ts_train_step,
                                       step_lr_schedule)
    from boxinstseg_tpu.models.layers import set_compute_dtype
    from __graft_entry__ import _synth_batch

    family = os.environ.get('BENCH_MODEL', 'boxinst')
    fam = bench.FAMILIES[family]
    batch_size = int(os.environ.get('BENCH_BATCH', fam['batch']))
    if os.environ.get('BENCH_BF16', '1') != '0':
        set_compute_dtype(jnp.bfloat16)
    h, w = fam['hw']
    cfg = Config.fromfile(os.path.join(ROOT, fam['cfg']))
    model = build_detector(dict(cfg.model))
    max_gts = int(cfg.get('max_gts', 100)) if hasattr(cfg, 'get') else 100
    live = int(os.environ.get('BENCH_LIVE_GTS', 16))
    buckets = sorted(int(g) for g in (cfg.get('gt_buckets') or ())) \
        if hasattr(cfg, 'get') else []
    cap = next((g for g in buckets if g >= live), max_gts)
    batch = _synth_batch(batch_size, h, w, max_gt=min(cap, max_gts),
                         with_masks=fam['masks'], live=live)
    sched = step_lr_schedule(0.005, 'linear', 500, 0.001, (60000, 80000))
    tx = build_optimizer(dict(type='SGD', lr=0.005, momentum=0.9,
                              weight_decay=1e-4), sched)
    if fam['ts']:
        from boxinstseg_tpu.ops.correspondence import create_object_bank
        head = dict(cfg.model['bbox_head'])
        lc = dict(head.get('loss_corr') or {})
        ob = dict(lc.get('obj_bank', {}))
        bank = create_object_bank(
            int(head['num_classes']),
            int(ob.get('len_object_queues', 100)),
            (int(ob.get('feat_height', 7)), int(ob.get('feat_width', 7))),
            (int(ob.get('mask_height', 28)), int(ob.get('mask_width', 28))),
            int(cfg.model['neck']['out_channels'])) if lc else None
        variables = init_variables(
            model, {'params': jax.random.PRNGKey(0)}, batch,
            jnp.zeros((), jnp.int32), None, None, bank, method=model.loss)
        state = create_train_state(model, variables, tx, ema=True,
                                   corr_state=bank)
        step = make_ts_train_step(model, tx, mesh=None, donate=True,
                                  momentum=0.999, start_iter=0,
                                  ts_thresh=1e9, corr_thresh=1e9)
    else:
        variables = init_variables(model, {'params': jax.random.PRNGKey(0)},
                                   batch, jnp.zeros((), jnp.int32),
                                   method=model.loss)
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, tx, mesh=None, donate=True)

    # warmup: compile + tunnel channel warmup
    for _ in range(3):
        state, logs = step(state, batch)
    float(logs['loss'])

    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        state, logs = step(state, batch)
    float(logs['loss'])
    jax.profiler.stop_trace()


def load_hlo_stats(logdir: str):
    from xprof.convert import raw_to_tool_data
    paths = sorted(glob.glob(os.path.join(
        logdir, '**', '*.xplane.pb'), recursive=True))
    if not paths:
        raise SystemExit(f'no xplane.pb under {logdir}')
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], 'hlo_stats', {})
    if isinstance(data, bytes):
        data = data.decode()
    import json
    tab = json.loads(data)
    keys = [c['id'] for c in tab['cols']]
    rows = [{k: (cell or {}).get('v') for k, cell in zip(keys, r['c'])}
            for r in tab['rows']]
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=3)
    ap.add_argument('--top', type=int, default=45)
    ap.add_argument('--group', action='store_true',
                    help='aggregate by (category, source line)')
    ap.add_argument('--logdir', default='/tmp/tpu_profile')
    ap.add_argument('--reuse', action='store_true',
                    help='skip capture; parse an existing --logdir')
    args = ap.parse_args()

    if not args.reuse:
        import shutil
        shutil.rmtree(args.logdir, ignore_errors=True)
        capture(args.steps, args.logdir)
    rows = load_hlo_stats(args.logdir)
    if not rows:
        raise SystemExit('hlo_stats table is empty — nothing captured?')

    def f(r, k):
        try:
            return float(r.get(k) or 0.0)
        except ValueError:
            return 0.0

    def _resolve(substr, default):
        # column ids vary across xprof versions; match on substring
        return next((k for k in rows[0] if substr in k.lower()), default)

    time_key = _resolve('self_time', 'total_self_time')
    cat_key = _resolve('category', 'category')
    src_key = _resolve('source', 'tf_op_name')
    name_key = _resolve('hlo_op_name', 'hlo_op_name')

    total = sum(f(r, time_key) for r in rows) / args.steps
    print(f'device total per step: {total / 1000:.2f} ms '
          f'({len(rows)} op rows; keys={time_key!r})')

    if args.group:
        agg = {}
        for r in rows:
            key = (r.get(cat_key, ''), (r.get(src_key) or '')[-60:])
            agg[key] = agg.get(key, 0.0) + f(r, time_key)
        items = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
        for (cat, src), us in items:
            print(f'{us / args.steps / 1000:9.3f} ms  {cat:24s} {src}')
    else:
        rows.sort(key=lambda r: -f(r, time_key))
        for r in rows[:args.top]:
            us = f(r, time_key) / args.steps
            src = (r.get(src_key) or '')[-55:]
            print(f'{us / 1000:9.3f} ms  {r.get(cat_key, ""):22s} '
                  f'{r.get(name_key, "")[:70]:70s} {src}')


if __name__ == '__main__':
    main()
