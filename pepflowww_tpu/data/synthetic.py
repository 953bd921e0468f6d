"""Synthetic peptide–pocket complexes for tests and benchmarks.

Builds chemically plausible full-atom structures by running random backbone
frames + random valid torsions through the same AF2-Alg.24 reconstruction the
model uses, then assembles batches with the exact schema the reference's data
pipeline produces (`models_con/pep_dataloader.py:41-70` +
`pepflow/utils/data.py:19-78`): receptor first (chain_nb 1), peptide second
(chain_nb 0 semantics follow the parser output; generate_mask marks the
peptide), positions centered on the peptide CA centroid.
"""

from __future__ import annotations

import numpy as np

from pepflowww_tpu import constants as C


def _random_rotmats(rng: np.random.Generator, shape):
    q = rng.normal(size=tuple(shape) + (4,))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return R.astype(np.float32)


def _cpu_device():
    import jax

    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        # The axon plugin's backend registry only exposes the cpu backend
        # after the full platform init; trigger it and retry once.
        jax.devices()
        return jax.local_devices(backend="cpu")[0]


def _build_pos15(aa: np.ndarray, R: np.ndarray, t: np.ndarray, angles: np.ndarray):
    """Full-atom positions via the JAX reconstruction, pinned to the host CPU
    backend (data generation must never round-trip the TPU tunnel)."""
    import jax
    import jax.numpy as jnp
    from pepflowww_tpu.ops import allatom

    with jax.default_device(_cpu_device()):
        pos14, _, _ = jax.jit(allatom.full_atom_reconstruction)(
            jnp.asarray(R)[None], jnp.asarray(t)[None], jnp.asarray(angles)[None],
            jnp.asarray(aa)[None],
        )
        pos15 = np.asarray(allatom.full_atom_to_pos15(pos14))[0]
    return pos15.astype(np.float32)


def make_complex(
    rng: np.random.Generator,
    pep_len: int = 12,
    rec_len: int = 40,
    complex_id: str = "synth",
):
    """One synthetic complex in the preprocessed-item schema (numpy)."""
    L = rec_len + pep_len
    aa = rng.integers(0, 20, size=(L,)).astype(np.int64)

    # Random frames: CA positions on a loose chain walk so distances are sane.
    steps = rng.normal(scale=1.5, size=(L, 3)).astype(np.float32)
    t = np.cumsum(steps + np.array([3.8, 0, 0], dtype=np.float32), axis=0)
    R = _random_rotmats(rng, (L,))
    angles = (rng.uniform(0, 2 * np.pi, size=(L, 5))).astype(np.float32)
    # Zero out chemically invalid torsions.
    angles = angles * C.TORSIONS_MASK[aa]

    pos15 = _build_pos15(aa, R, t, angles)

    # Center on the peptide CA centroid (pep_dataloader.py:50-51).
    pep_sl = slice(rec_len, L)
    center = pos15[pep_sl, C.BBHeavyAtom.CA].mean(axis=0)
    pos15 = pos15 - center[None, None, :]

    mask15 = C.HEAVYATOM_MASK_GEN[aa].copy()

    # Torsion re-extraction from coordinates (matches preprocessing order:
    # angles computed after centering, pep_dataloader.py:52).
    import jax
    import jax.numpy as jnp
    from pepflowww_tpu.ops import allatom

    with jax.default_device(_cpu_device()):
        tor, tor_mask = jax.jit(allatom.get_torsion_angles)(
            jnp.asarray(pos15)[None], jnp.asarray(aa)[None]
        )
        tor = np.asarray(tor)[0].astype(np.float32)
        tor_mask = np.asarray(tor_mask)[0]

    chain_nb = np.concatenate(
        [np.ones(rec_len, dtype=np.int64), np.zeros(pep_len, dtype=np.int64)]
    )
    res_nb = np.concatenate(
        [np.arange(1, rec_len + 1, dtype=np.int64), np.arange(1, pep_len + 1, dtype=np.int64)]
    )
    generate_mask = np.concatenate(
        [np.zeros(rec_len, dtype=bool), np.ones(pep_len, dtype=bool)]
    )

    return {
        "id": complex_id,
        "aa": aa,
        "pos_heavyatom": pos15,
        "mask_heavyatom": mask15,
        "chain_nb": chain_nb,
        "chain_id": ["B"] * rec_len + ["A"] * pep_len,
        "res_nb": res_nb,
        "resseq": res_nb.copy(),
        "icode": [" "] * L,
        "generate_mask": generate_mask,
        "torsion_angle": tor,
        "torsion_angle_mask": tor_mask,
    }


def make_raw_complex(
    rng: np.random.Generator,
    pep_len: int = 12,
    rec_len: int = 80,
    complex_id: str = "synth",
):
    """One synthetic RAW receptor–peptide complex whose receptor residues
    cluster AROUND the peptide (each CA placed 4.5–16 Å from a random peptide
    CA), so `tools/make_dataset.py`'s pocket@10 Å carve keeps a realistic
    15–70-residue pocket instead of the tail of a wandering chain walk.
    Used only by `make_synthetic_structures.py --raw` (round-3 rehearsal);
    `make_complex` stays the fixture-pinned generator."""
    L = rec_len + pep_len
    aa = rng.integers(0, 20, size=(L,)).astype(np.int64)

    pep_steps = rng.normal(scale=1.5, size=(pep_len, 3)).astype(np.float32)
    pep_t = np.cumsum(pep_steps + np.array([3.8, 0, 0], dtype=np.float32), axis=0)

    anchors = pep_t[rng.integers(0, pep_len, size=rec_len)]
    dirs = rng.normal(size=(rec_len, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8
    dist = rng.uniform(4.5, 16.0, size=(rec_len, 1)).astype(np.float32)
    rec_t = anchors + dirs * dist

    t = np.concatenate([rec_t, pep_t], axis=0).astype(np.float32)
    R = _random_rotmats(rng, (L,))
    angles = (rng.uniform(0, 2 * np.pi, size=(L, 5))).astype(np.float32)
    angles = angles * C.TORSIONS_MASK[aa]
    pos15 = _build_pos15(aa, R, t, angles)

    mask15 = C.HEAVYATOM_MASK_GEN[aa].copy()
    chain_nb = np.concatenate(
        [np.ones(rec_len, dtype=np.int64), np.zeros(pep_len, dtype=np.int64)]
    )
    res_nb = np.concatenate(
        [np.arange(1, rec_len + 1, dtype=np.int64),
         np.arange(1, pep_len + 1, dtype=np.int64)]
    )
    return {
        "id": complex_id,
        "aa": aa,
        "pos_heavyatom": pos15,
        "mask_heavyatom": mask15,
        "chain_nb": chain_nb,
        "chain_id": ["B"] * rec_len + ["A"] * pep_len,
        "res_nb": res_nb,
        "resseq": res_nb.copy(),
        "icode": [" "] * L,
        "generate_mask": np.concatenate(
            [np.zeros(rec_len, dtype=bool), np.ones(pep_len, dtype=bool)]
        ),
    }


def make_batch(
    rng: np.random.Generator,
    batch_size: int = 4,
    pep_len: int = 12,
    rec_len: int = 40,
    pad_to: int | None = None,
):
    """Batch of identical-shape synthetic complexes, padded, jnp-ready fields
    only (drops string metadata)."""
    items = [
        make_complex(rng, pep_len=pep_len, rec_len=rec_len, complex_id=f"synth{i}")
        for i in range(batch_size)
    ]
    from pepflowww_tpu.data.collate import pad_and_collate

    return pad_and_collate(items, pad_to=pad_to)
