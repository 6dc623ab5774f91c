"""Golden-value oracle loader: AST-extract pure-torch functions/classes from
the READ-ONLY reference source tree (/root/reference) and exec them with a
minimal torch namespace.

This gives true reference-traced values for parity tests without importing
the reference package (mmcv is not installed) and without copying reference
code into this repository — the reference files are parsed at test time.
"""
import ast
import functools
import os

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REF_ROOT = os.environ.get('REF_ROOT', '/root/reference')


class _FakeRegistry:
    """Stands in for mmcv/mmdet registries so @X.register_module() class
    decorators in extracted source are no-ops."""

    def register_module(self, *args, **kwargs):
        def deco(obj):
            return obj
        return deco


class _FakeMMCV:
    """@mmcv.jit(...) decorators become no-ops."""

    @staticmethod
    def jit(*args, **kwargs):
        def deco(fn):
            return fn
        return deco


def ref_available() -> bool:
    return os.path.isdir(REF_ROOT)


@functools.lru_cache(maxsize=None)
def _parse(relpath: str):
    with open(os.path.join(REF_ROOT, relpath)) as f:
        return ast.parse(f.read())


def load_ref(relpath: str, names, extra_ns=None) -> dict:
    """Extract top-level functions/classes ``names`` from the reference file
    ``relpath`` and exec them. Returns {name: object}."""
    tree = _parse(relpath)
    names = tuple(names)
    picked = {}
    body = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) \
                and node.name in names:
            body.append(node)
            picked[node.name] = node
    missing = set(names) - set(picked)
    if missing:
        raise KeyError(f'{missing} not found at top level of {relpath}')
    mod = ast.Module(body=body, type_ignores=[])
    ns = dict(torch=torch, nn=nn, F=F, np=np, mmcv=_FakeMMCV(),
              HEADS=_FakeRegistry(), LOSSES=_FakeRegistry(),
              MATCH_COST=_FakeRegistry(), BBOX_ASSIGNERS=_FakeRegistry())
    ns.update(extra_ns or {})
    exec(compile(mod, os.path.join(REF_ROOT, relpath), 'exec'), ns)
    return {n: ns[n] for n in names}


def load_ref_method(relpath: str, class_name: str, method_name: str,
                    extra_ns=None):
    """Extract a single method from a reference class as an unbound function
    (call with a SimpleNamespace carrying the attributes it reads)."""
    tree = _parse(relpath)
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) \
                        and sub.name == method_name:
                    sub = ast.Module(body=[sub], type_ignores=[])
                    ns = dict(torch=torch, nn=nn, F=F, np=np, INF=1e8)
                    ns.update(extra_ns or {})
                    exec(compile(sub, relpath, 'exec'), ns)
                    return ns[method_name]
    raise KeyError(f'{class_name}.{method_name} not found in {relpath}')


def to_torch(x):
    return torch.from_numpy(np.asarray(x))


def to_np(x):
    return x.detach().cpu().numpy()
