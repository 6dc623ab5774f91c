"""Native C++ RLE codec vs the python/numpy fallback (and pycocotools'
string format)."""
import numpy as np
import pytest

import boxinstseg_tpu  # noqa: F401
from boxinstseg_tpu.data import coco_api as ca
from boxinstseg_tpu.native import rle_lib


def test_native_rle_available_and_exact(rng):
    if rle_lib() is None:
        pytest.skip('no C++ compiler available')
    for _ in range(30):
        h, w = rng.randint(3, 64, 2)
        m = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
        enc = ca.rle_encode(m)
        # the string must equal the pure-python pycocotools-format codec
        flat = np.asfortranarray(m).T.reshape(-1)
        diffs = np.nonzero(flat[1:] != flat[:-1])[0] + 1
        bounds = np.concatenate([[0], diffs, [flat.size]])
        counts = np.diff(bounds).tolist()
        if flat.size and flat[0] == 1:
            counts = [0] + counts
        assert enc['counts'] == ca._encode_rle_string(counts).decode()
        np.testing.assert_array_equal(ca.rle_decode(enc), m)


def test_rle_uncompressed_counts(rng):
    m = np.zeros((7, 5), np.uint8)
    m[2:5, 1:4] = 1
    enc = ca.rle_encode(m)
    dec = ca.rle_decode({'size': [7, 5],
                         'counts': ca._decode_rle_string(
                             enc['counts'].encode())})
    np.testing.assert_array_equal(dec, m)
