"""Checkpoint save/restore (orbax) with the reference's logical layout.

The reference stores {config, model, optimizer, scheduler, iteration} per
checkpoint (`train.py:194-203`) and resumes all four (`train.py:101-109`);
rank-0-only saving maps to process-0-only here. `latest_checkpoint` mirrors
`pepflow/utils/misc.py:102-107`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(ckpt_dir: str, it: int, params, opt_state, scheduler_state: dict,
                    extra: Optional[dict] = None):
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(_abs(ckpt_dir), str(it))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": params,
            "opt_state": opt_state,
            "scheduler": dict(scheduler_state),
            "iteration": it,
            **({"extra": extra} if extra else {}),
        },
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    its = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not its:
        return None
    return os.path.join(_abs(ckpt_dir), str(max(its)))


def restore_checkpoint(path: str, template: dict) -> dict:
    """Restore with `template` as the pytree/shape/sharding reference."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_abs(path), template)
