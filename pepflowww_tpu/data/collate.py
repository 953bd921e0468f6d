"""Batch assembly: padding + length bucketing for static XLA shapes.

Re-designs the reference's `PaddingCollate` (`pepflow/utils/data.py:19-78`).
The reference pads each batch to its own max length (rounded to a multiple of
8) — fine for eager torch, but every fresh length triggers an XLA recompile.
Here batches pad to a *bucket* boundary instead, so the number of distinct
compiled programs is bounded by the bucket list.

Pad values: aa -> PAD_RESIDUE_INDEX (21), everything else -> 0; `res_mask`
marks real residues.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

from pepflowww_tpu.constants import PAD_RESIDUE_INDEX

#: Array fields carried into device batches (string metadata stays host-side).
TENSOR_KEYS = (
    "aa",
    "pos_heavyatom",
    "mask_heavyatom",
    "chain_nb",
    "res_nb",
    "resseq",
    "generate_mask",
    "torsion_angle",
    "torsion_angle_mask",
)

DEFAULT_BUCKETS = (32, 48, 64, 96, 128, 160, 192, 256)


def bucket_length(n: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(math.ceil(n / 8) * 8)


def _pad_first(x: np.ndarray, n: int, value=0) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad_shape = (n - x.shape[0],) + x.shape[1:]
    return np.concatenate([x, np.full(pad_shape, value, dtype=x.dtype)], axis=0)


def pad_and_collate(
    items: Sequence[dict],
    pad_to: Optional[int] = None,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    eight: bool = True,
) -> dict:
    """Stack per-complex dicts into a padded numpy batch.

    `pad_to=None` pads to the bucket above the batch max length (or to a
    multiple of 8 if `eight` and no bucket fits, mirroring data.py:67-68).
    """
    max_len = max(item["aa"].shape[0] for item in items)
    if pad_to is None:
        pad_to = bucket_length(max_len, buckets) if eight else max_len
    assert pad_to >= max_len, f"pad_to={pad_to} < max item length {max_len}"

    out = {}
    for key in TENSOR_KEYS:
        if key not in items[0]:
            continue
        value = PAD_RESIDUE_INDEX if key == "aa" else 0
        out[key] = np.stack(
            [_pad_first(np.asarray(item[key]), pad_to, value) for item in items]
        )
    out["res_mask"] = np.stack(
        [
            _pad_first(np.ones(item["aa"].shape[0], dtype=bool), pad_to, False)
            for item in items
        ]
    )
    out["id"] = [item.get("id", "") for item in items]
    return out


def device_batch(batch: dict) -> dict:
    """Drop host-only fields; cast index fields to int32 for TPU."""
    db = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            continue
        if v.dtype in (np.int64, np.uint32):
            v = v.astype(np.int32)
        db[k] = v
    return db


def replicate_item(item: dict, n: int) -> list:
    """n shallow copies of one complex (for num_samples-style sampling,
    cf. models_con/inference.py:72)."""
    return [dict(item) for _ in range(n)]


def mask_select(v, mask: np.ndarray):
    """Select residues by boolean mask, for arrays/lists of residue length
    (pepflow/utils/data.py:111-117)."""
    n = len(mask)
    if isinstance(v, np.ndarray) and v.shape[:1] == (n,):
        return v[mask]
    if isinstance(v, list) and len(v) == n:
        return [x for x, m in zip(v, mask) if m]
    return v


def mask_select_data(data: dict, mask: np.ndarray) -> dict:
    """pepflow/utils/data.py:120-124."""
    return {k: mask_select(v, mask) for k, v in data.items()}


def index_select(v, index: np.ndarray, n: int):
    """Select residues by integer index for length-n arrays/lists
    (pepflow/utils/data.py:95-101)."""
    if isinstance(v, np.ndarray) and v.shape[:1] == (n,):
        return v[index]
    if isinstance(v, list) and len(v) == n:
        return [v[i] for i in index]
    return v


def index_select_data(data: dict, index: np.ndarray) -> dict:
    """pepflow/utils/data.py:104-108."""
    n = len(data["aa"])
    return {k: index_select(v, index, n) for k, v in data.items()}


def apply_patch_to_tensor(x_full: np.ndarray, x_patch: np.ndarray,
                          patch_idx: np.ndarray) -> np.ndarray:
    """Write a row patch into a copy of x_full (pepflow/utils/data.py:81-92)."""
    out = np.array(x_full, copy=True)
    out[patch_idx] = x_patch
    return out


def find_longest_true_segment(mask: np.ndarray) -> np.ndarray:
    """Boolean mask of the longest run of True values
    (pepflow/utils/data.py:127-148), vectorized."""
    m = np.asarray(mask, dtype=bool)
    out = np.zeros_like(m)
    if not m.any():
        return out
    padded = np.concatenate([[False], m, [False]])
    edges = np.flatnonzero(np.diff(padded.astype(np.int8)))
    starts, ends = edges[::2], edges[1::2]
    best = np.argmax(ends - starts)
    out[starts[best] : ends[best]] = True
    return out
