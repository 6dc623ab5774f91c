"""Native (C++) host-side components, compiled on first use.

The reference ships CUDA/C++ extensions built by setup.sh; the TPU compute
path here is XLA/Pallas, but host-side hot loops still warrant native code.
Currently: the COCO RLE codec (rle.cpp — pycocotools' maskApi counterpart)
used by the eval loop.

Build: g++ -O3 -shared at import into ``_build/`` next to the sources,
keyed by a source hash; loaded with ctypes. Falls back cleanly (callers
check ``rle_lib() is not None``) if no compiler is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _compile(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src, '-o', out],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def rle_lib() -> Optional[ctypes.CDLL]:
    """The compiled RLE library, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_DIR, 'rle.cpp')
    if not os.path.exists(src):
        return None
    with open(src, 'rb') as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    build_dir = os.path.join(_DIR, '_build')
    out = os.path.join(build_dir, f'librle_{tag}.so')
    if not os.path.exists(out):
        os.makedirs(build_dir, exist_ok=True)
        tmp = out + f'.tmp{os.getpid()}'
        if not _compile(src, tmp):
            return None
        try:
            os.replace(tmp, out)
        except OSError:
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.rle_encode_mask.restype = ctypes.c_int
    lib.rle_encode_mask.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                    u32p, ctypes.c_int]
    lib.rle_decode_counts.restype = None
    lib.rle_decode_counts.argtypes = [u32p, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, u8p]
    lib.rle_string_encode.restype = ctypes.c_int
    lib.rle_string_encode.argtypes = [u32p, ctypes.c_int,
                                      ctypes.c_char_p, ctypes.c_int]
    lib.rle_string_decode.restype = ctypes.c_int
    lib.rle_string_decode.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                      u32p, ctypes.c_int]
    _LIB = lib
    return _LIB
