#!/usr/bin/env python
"""Print the fully-resolved config (reference: tools/misc/print_config.py
CLI surface — CONFIG positional + --cfg-options; ${key} interpolation and
legacy migrations applied exactly as tools/train.py does)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..', '..'))


def main():
    p = argparse.ArgumentParser(description='Print the whole config')
    p.add_argument('config', help='config file path')
    p.add_argument('--cfg-options', nargs='+', default=[],
                   help='override config, format key=value')
    args = p.parse_args()

    from boxinstseg_tpu.config import Config, compat_cfg, replace_cfg_vals
    cfg = compat_cfg(replace_cfg_vals(Config.fromfile(args.config)))
    overrides = {}
    for kv in args.cfg_options:
        k, v = kv.split('=', 1)
        overrides[k] = v
    cfg.merge_from_dict(overrides)
    print(repr(cfg))


if __name__ == '__main__':
    main()
