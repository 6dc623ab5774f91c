#!/usr/bin/env python
"""Training entry point (public surface parity with the reference's
tools/train.py: CONFIG positional, --work-dir, --resume-from,
--cfg-options, --seed; launcher flags are accepted but moot — pjit over
the local mesh replaces torch.distributed.launch)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def parse_args():
    p = argparse.ArgumentParser(description='Train a detector')
    p.add_argument('config', help='config file path')
    p.add_argument('--work-dir', help='dir to save logs and checkpoints')
    p.add_argument('--resume-from', help='checkpoint dir to resume from')
    p.add_argument('--auto-resume', action='store_true')
    p.add_argument('--no-validate', action='store_true')
    p.add_argument('--auto-scale-lr', action='store_true',
                   help='enable cfg.auto_scale_lr (linear batch-size LR '
                        'scaling, reference tools/train.py:90)')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='override config, format key=value')
    p.add_argument('--pretrained-backbone',
                   help='torch .pth with backbone weights to convert')
    p.add_argument('--launcher', default='none',
                   help='accepted for CLI parity; ignored (pjit handles '
                        'data parallelism)')
    p.add_argument('--local_rank', type=int, default=0)
    p.add_argument('--device', default='auto',
                   help="jax platform to pin ('cpu', 'tpu', ...); 'auto' "
                        'keeps the default (the JAX_PLATFORMS env var is '
                        'ignored by some PJRT plugins, so pin via this flag)')
    return p.parse_args()


def pin_device(device: str):
    if device and device != 'auto':
        import jax
        jax.config.update('jax_platforms', device)


def main():
    args = parse_args()
    pin_device(args.device)
    # multi-host bring-up (reference: tools/dist_train.sh launcher); no-op
    # unless JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    # are set (or the TPU pod runtime provides them)
    from boxinstseg_tpu.parallel import init_distributed
    init_distributed()
    from boxinstseg_tpu.config import Config
    from boxinstseg_tpu.registry import build_detector, build_dataset
    from boxinstseg_tpu.apis.train import train_detector
    from boxinstseg_tpu.utils.logging import get_root_logger
    from boxinstseg_tpu.utils.env import collect_env

    from boxinstseg_tpu.config import compat_cfg, replace_cfg_vals
    cfg = compat_cfg(replace_cfg_vals(Config.fromfile(args.config)))
    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split('=', 1)
        overrides[k] = v
    cfg.merge_from_dict(overrides)
    if args.work_dir:
        cfg.work_dir = args.work_dir
    elif not cfg.get('work_dir'):
        cfg.work_dir = os.path.join(
            './work_dirs', os.path.splitext(os.path.basename(
                args.config))[0])
    os.makedirs(cfg.work_dir, exist_ok=True)
    cfg.seed = args.seed
    if args.auto_resume:
        cfg.auto_resume = True
    if args.auto_scale_lr:
        if 'auto_scale_lr' in cfg:
            cfg.auto_scale_lr['enable'] = True
        else:
            cfg.auto_scale_lr = dict(enable=True, base_batch_size=16)

    logger = get_root_logger(os.path.join(cfg.work_dir, 'train.log'))
    for k, v in collect_env().items():
        logger.info(f'{k}: {v}')

    model = build_detector(cfg.model.copy())
    dataset = build_dataset(cfg.data['train'])
    val_dataset = None
    if not args.no_validate and 'val' in cfg.get('data', {}):
        val_dataset = build_dataset({**cfg.data['val'], 'test_mode': True})

    init_params = None
    if args.pretrained_backbone:
        from boxinstseg_tpu.utils.checkpoint_convert import \
            load_torchvision_resnet
        p, s = load_torchvision_resnet(args.pretrained_backbone)
        init_params = ({'backbone_m': p}, {'backbone_m': s})
        logger.info(f'loaded pretrained backbone from '
                    f'{args.pretrained_backbone}')

    train_detector(model, dataset, cfg, validate=val_dataset is not None,
                   val_dataset=val_dataset, resume_from=args.resume_from,
                   init_params=init_params)


if __name__ == '__main__':
    main()
