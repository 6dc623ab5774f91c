"""Checkpoint save/restore via orbax (reference: mmcv CheckpointHook +
runner.resume — model, optimizer state and iteration all persist; the
BoxInst pairwise-warmup counter rides in ``state.step``, matching the
reference's registered ``_iter`` buffer, condinst_head.py:1104)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir: str, max_to_keep: Optional[int] = 3
             ) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                           create=True)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


def save_checkpoint(ckpt_dir: str, state: Any, step: int,
                    max_to_keep: Optional[int] = 3,
                    meta: Optional[dict] = None) -> None:
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    if meta and jax.process_index() == 0:
        # reference parity: checkpoints carry version + CLASSES
        # (tools/train.py:226-229 via CheckpointHook meta)
        import json
        with open(os.path.join(ckpt_dir, 'meta.json'), 'w') as f:
            json.dump(meta, f, indent=2, default=str)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(ckpt_dir: str, target: Any,
                       step: Optional[int] = None) -> Any:
    """Restore into the structure of ``target`` (a TrainState template)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored
