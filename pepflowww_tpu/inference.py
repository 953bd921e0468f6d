"""Sampler-output post-processing: full-atom rebuild and PDB export.

Covers the reference's `models_con/sample.py`:

* `sample_for_data_bb`/`save_samples_bb` (:40-94) — backbone-only rebuild via
  idealized frames, context spliced back by generate_mask
* `save_samples_sc` (:96-120) — full-atom rebuild from (frames, angles, seqs)
  via AF2 Alg. 24 + per-restype heavy-atom masks

plus the metric/CSV reporting half of `models_con/inference.py`.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from pepflowww_tpu import constants as C
from pepflowww_tpu.data.pdb import save_pdb
from pepflowww_tpu.ops import allatom
from pepflowww_tpu.ops.frames import construct_3d_basis


def reconstruct_full_atom_outputs(sample_out: dict, batch: dict):
    """(pos15, mask15) per sample with context residues kept intact."""
    rot = jnp.asarray(sample_out["rotmats"])
    trans = jnp.asarray(sample_out["trans"])
    angles = jnp.asarray(sample_out["angles"])
    seqs = jnp.asarray(sample_out["seqs"])
    gen = jnp.asarray(batch["generate_mask"])

    pos14, _, _ = allatom.full_atom_reconstruction(rot, trans, angles, seqs)
    pos15 = allatom.full_atom_to_pos15(pos14)
    mask15 = allatom.heavyatom_mask_for(seqs)

    ctx_pos = jnp.asarray(batch["pos_heavyatom"])
    ctx_mask = jnp.asarray(batch["mask_heavyatom"]).astype(bool)
    pos15 = jnp.where(gen[..., None, None], pos15, ctx_pos)
    mask15 = jnp.where(gen[..., None], mask15, ctx_mask)
    return np.asarray(pos15), np.asarray(mask15)


def reconstruct_backbone_outputs(sample_out: dict, batch: dict):
    """Backbone-only rebuild (N/CA/C/O), context spliced (sample.py:40-66)."""
    rot = jnp.asarray(sample_out["rotmats"])
    trans = jnp.asarray(sample_out["trans"])
    seqs = jnp.asarray(sample_out["seqs"])
    pos_ctx = jnp.asarray(batch["pos_heavyatom"])
    mask_atoms = jnp.asarray(batch["mask_heavyatom"]).astype(bool)
    gen = jnp.asarray(batch["generate_mask"])
    pos_new, mask_new = allatom.reconstruct_backbone_partially(
        pos_ctx, rot, trans, seqs,
        jnp.asarray(batch["chain_nb"]), jnp.asarray(batch["res_nb"]),
        mask_atoms, gen,
    )
    return np.asarray(pos_new), np.asarray(mask_new)


def write_sample_pdbs(sample_out: dict, batch_np: dict, out_dir: str,
                      backbone_only: bool = False):
    """One PDB per batch row (sample) under out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    if backbone_only:
        pos15, mask15 = reconstruct_backbone_outputs(sample_out, batch_np)
    else:
        pos15, mask15 = reconstruct_full_atom_outputs(sample_out, batch_np)
    seqs = np.asarray(sample_out["seqs"])
    B, L = seqs.shape
    res_mask = np.asarray(batch_np["res_mask"]).astype(bool)
    paths = []
    for b in range(B):
        sel = res_mask[b]
        data = {
            "aa": seqs[b][sel],
            "pos_heavyatom": pos15[b][sel],
            "mask_heavyatom": mask15[b][sel],
            "chain_nb": np.asarray(batch_np["chain_nb"])[b][sel],
            "resseq": np.asarray(batch_np["resseq"])[b][sel],
            "chain_id": _chain_letters(np.asarray(batch_np["chain_nb"])[b][sel]),
            "icode": [" "] * int(sel.sum()),
        }
        path = os.path.join(out_dir, f"sample_{b}.pdb")
        save_pdb(data, path)
        paths.append(path)
    return paths


def _chain_letters(chain_nb: np.ndarray):
    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    return [letters[int(c) % 26] for c in chain_nb]
