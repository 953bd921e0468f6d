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


def _reconstruct_full_atom(rot, trans, angles, seqs, gen, ctx_pos, ctx_mask):
    pos14, _, _ = allatom.full_atom_reconstruction(rot, trans, angles, seqs)
    pos15 = allatom.full_atom_to_pos15(pos14)
    mask15 = allatom.heavyatom_mask_for(seqs)
    pos15 = jnp.where(gen[..., None, None], pos15, ctx_pos)
    mask15 = jnp.where(gen[..., None], mask15, ctx_mask)
    return pos15, mask15


# Module-level jit wrappers: a fresh jax.jit(f) per call would rebuild the
# wrapper (and risk its cache) every group; one wrapper keyed by shape keeps
# exactly one compile per (B, L) bucket for the whole process.
_JIT_RECONSTRUCT_FULL = None
_JIT_RECONSTRUCT_BB = None


def _jit_full():
    global _JIT_RECONSTRUCT_FULL
    if _JIT_RECONSTRUCT_FULL is None:
        import jax

        _JIT_RECONSTRUCT_FULL = jax.jit(_reconstruct_full_atom)
    return _JIT_RECONSTRUCT_FULL


def _jit_bb():
    global _JIT_RECONSTRUCT_BB
    if _JIT_RECONSTRUCT_BB is None:
        import jax

        _JIT_RECONSTRUCT_BB = jax.jit(allatom.reconstruct_backbone_partially)
    return _JIT_RECONSTRUCT_BB


def reconstruct_full_atom_outputs(sample_out: dict, batch: dict):
    """(pos15, mask15) per sample with context residues kept intact.

    One jit call per output shape, NOT eager ops: Alg-24 dispatches dozens
    of small gathers/matmuls, and eager dispatch on this image's remote-TPU
    tunnel costs whole seconds PER OP (CLAUDE.md trap; measured via
    serve.py's per-group timing split — the eager form was the serving
    bottleneck at 64-row groups). jit's shape-keyed cache bounds compiles to
    the server's bucketed (B, L) set; sample.py reuses one shape throughout.
    """
    pos15, mask15 = _jit_full()(
        jnp.asarray(sample_out["rotmats"]),
        jnp.asarray(sample_out["trans"]),
        jnp.asarray(sample_out["angles"]),
        jnp.asarray(sample_out["seqs"]),
        jnp.asarray(batch["generate_mask"]),
        jnp.asarray(batch["pos_heavyatom"]),
        jnp.asarray(batch["mask_heavyatom"]).astype(bool),
    )
    return np.asarray(pos15), np.asarray(mask15)


def reconstruct_backbone_outputs(sample_out: dict, batch: dict):
    """Backbone-only rebuild (N/CA/C/O), context spliced (sample.py:40-66).

    jit for the same reason as reconstruct_full_atom_outputs above (eager
    per-op dispatch is pathological over this image's remote-TPU tunnel)."""
    pos_new, mask_new = _jit_bb()(
        jnp.asarray(batch["pos_heavyatom"]),
        jnp.asarray(sample_out["rotmats"]),
        jnp.asarray(sample_out["trans"]),
        jnp.asarray(sample_out["seqs"]),
        jnp.asarray(batch["chain_nb"]), jnp.asarray(batch["res_nb"]),
        jnp.asarray(batch["mask_heavyatom"]).astype(bool),
        jnp.asarray(batch["generate_mask"]),
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
