#!/usr/bin/env python
"""Export a pepflowww_tpu orbax checkpoint to a reference-format .pt file.

The output loads directly into the reference implementation
(`FlowModel.load_state_dict(torch.load(out)["model"])`, cf.
/root/reference/models_con/inference.py:61-65), so TPU-trained models can be
evaluated with the reference's own inference/eval stack.

Usage:
    python tools/export_checkpoint.py --ckpt logs/run/checkpoints/20000 \
        --out model_tpu.pt [--num_blocks 6] [--seq_tfmr_num_layers 2]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir (train.py output)")
    ap.add_argument("--out", required=True, help=".pt path to write")
    ap.add_argument("--num_blocks", type=int, default=6)
    ap.add_argument("--seq_tfmr_num_layers", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp
    import torch

    from pepflowww_tpu.convert import export_state_dict

    # Restore to plain numpy regardless of the shardings the checkpoint was
    # saved with (a TPU-trained checkpoint restores fine on a CPU-only host).
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(args.ckpt)
    meta = ckptr.metadata(path)
    tree = meta.item_metadata if hasattr(meta, "item_metadata") else meta
    restore_args = jax.tree.map(
        lambda _m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    restored = ckptr.restore(path, restore_args=restore_args)
    params = restored["params"]
    sd = export_state_dict(params, num_blocks=args.num_blocks,
                           seq_tfmr_num_layers=args.seq_tfmr_num_layers)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
               for k, v in sd.items()}
    torch.save({"model": tensors, "iteration": int(restored.get("iteration", 0))},
               args.out)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB, "
          f"{len(tensors)} tensors)")


if __name__ == "__main__":
    main()
