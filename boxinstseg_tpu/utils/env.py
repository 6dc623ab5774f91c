"""Environment collection (reference: mmdet/utils/collect_env.py)."""
from __future__ import annotations

import platform
import sys
from typing import Dict


def collect_env() -> Dict[str, str]:
    info = {
        'sys.platform': sys.platform,
        'Python': sys.version.replace('\n', ''),
        'platform': platform.platform(),
    }
    try:
        import jax
        info['JAX'] = jax.__version__
        info['devices'] = ', '.join(str(d) for d in jax.devices())
        info['default_backend'] = jax.default_backend()
    except Exception as e:  # pragma: no cover
        info['JAX'] = f'unavailable ({e})'
    try:
        import flax
        import optax
        info['flax'] = flax.__version__
        info['optax'] = optax.__version__
    except Exception:  # pragma: no cover
        pass
    import boxinstseg_tpu
    info['boxinstseg_tpu'] = boxinstseg_tpu.__version__
    return info
