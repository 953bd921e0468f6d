"""Data layer tests: PDB IO round trip, collate, record store, dataset build."""

import os

import numpy as np

from pepflowww_tpu import constants as C
from pepflowww_tpu.data import recordstore
from pepflowww_tpu.data.collate import bucket_length, device_batch, pad_and_collate
from pepflowww_tpu.data.pdb import parse_pdb, save_pdb
from pepflowww_tpu.data.synthetic import make_complex


def test_pdb_roundtrip(tmp_path, rng):
    item = make_complex(rng, pep_len=8, rec_len=12)
    path = str(tmp_path / "complex.pdb")
    save_pdb(item, path)
    parsed, seq_map = parse_pdb(path)
    assert parsed is not None
    # Chains may reorder (sorted by chain id) but residue content must match.
    assert len(parsed["aa"]) == len(item["aa"])
    order = np.argsort(item["chain_id"], kind="stable")
    np.testing.assert_array_equal(parsed["aa"], item["aa"][order])
    got = parsed["pos_heavyatom"][parsed["mask_heavyatom"]]
    want = item["pos_heavyatom"][order][parsed["mask_heavyatom"]]
    np.testing.assert_allclose(got, want, atol=2e-3)  # PDB has 3 decimals


def test_collate_padding(rng):
    items = [make_complex(rng, pep_len=5, rec_len=10), make_complex(rng, pep_len=8, rec_len=20)]
    batch = pad_and_collate(items, pad_to=32)
    assert batch["aa"].shape == (2, 32)
    assert batch["pos_heavyatom"].shape == (2, 32, 15, 3)
    assert batch["res_mask"][0].sum() == 15 and batch["res_mask"][1].sum() == 28
    assert (batch["aa"][0, 15:] == C.PAD_RESIDUE_INDEX).all()
    db = device_batch(batch)
    assert db["aa"].dtype == np.int32
    assert "id" not in db


def test_bucket_length():
    assert bucket_length(10) == 32
    assert bucket_length(33) == 48
    assert bucket_length(300) == 304


def test_recordstore(tmp_path):
    path = str(tmp_path / "store.rec")
    with recordstore.RecordStoreWriter(path) as w:
        w.put("a", {"x": np.arange(5), "name": "a"})
        w.put("b", {"x": np.ones((3, 3)), "name": "b"})
    assert recordstore.exists(path)
    rs = recordstore.RecordStore(path)
    assert len(rs) == 2
    np.testing.assert_array_equal(rs.get("a")["x"], np.arange(5))
    assert rs[1]["name"] == "b"


def test_dataset_build_and_load(tmp_path, rng):
    # Build a mini PepMerge-style structure dir from synthetic complexes.
    structure_dir = tmp_path / "structures"
    for i in range(3):
        item = make_complex(rng, pep_len=6 + i, rec_len=15)
        cdir = structure_dir / f"complex_{i}"
        os.makedirs(cdir)
        pep_sel = item["generate_mask"]
        rec_sel = ~pep_sel

        def subset(sel):
            return {
                k: (v[sel] if isinstance(v, np.ndarray) else [x for x, s in zip(v, sel) if s])
                for k, v in item.items()
                if k not in ("id", "generate_mask", "torsion_angle", "torsion_angle_mask")
            }

        save_pdb(subset(pep_sel), str(cdir / "peptide.pdb"))
        save_pdb(subset(rec_sel), str(cdir / "pocket.pdb"))

    from pepflowww_tpu.data.dataset import DataLoader, PepDataset

    ds = PepDataset(str(structure_dir), str(tmp_path / "cache"), name="mini", n_jobs=1)
    assert len(ds) == 3
    item = ds[0]
    assert item["generate_mask"].sum() >= 6
    assert item["torsion_angle"].shape[-1] == 5
    # Peptide CA centroid is at the origin (pep_dataloader.py:50-51).
    pep_ca = item["pos_heavyatom"][item["generate_mask"], C.BBHeavyAtom.CA]
    np.testing.assert_allclose(pep_ca.mean(axis=0), np.zeros(3), atol=1e-3)

    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=0)
    batch = next(iter(loader))
    assert batch["aa"].shape[0] == 2


def test_dataset_exclusion(tmp_path, rng):
    structure_dir = tmp_path / "structures"
    for i in range(2):
        item = make_complex(rng, pep_len=6, rec_len=12)
        cdir = structure_dir / f"cx_{i}"
        os.makedirs(cdir)
        sel = item["generate_mask"]

        def subset(s):
            return {
                k: (v[s] if isinstance(v, np.ndarray) else [x for x, ss in zip(v, s) if ss])
                for k, v in item.items()
                if k not in ("id", "generate_mask", "torsion_angle", "torsion_angle_mask")
            }

        save_pdb(subset(sel), str(cdir / "peptide.pdb"))
        save_pdb(subset(~sel), str(cdir / "pocket.pdb"))
    names = tmp_path / "names.txt"
    names.write_text("cx_0\n")
    from pepflowww_tpu.data.dataset import PepDataset

    ds = PepDataset(str(structure_dir), str(tmp_path / "cache2"), name="mini2",
                    exclude_names_file=str(names), n_jobs=1)
    assert len(ds) == 1 and ds.ids == ["cx_1"]


def test_loader_prefetch(tmp_path, rng):
    from pepflowww_tpu.data.dataset import DataLoader
    from pepflowww_tpu.data.synthetic import make_complex

    items = [make_complex(rng, pep_len=5, rec_len=8) for _ in range(6)]

    class ListDataset:
        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            return items[i]

    loader = DataLoader(ListDataset(), batch_size=2, shuffle=True, seed=0)
    it = loader.prefetch(depth=2)
    batches = [next(it) for _ in range(7)]  # crosses an epoch boundary
    assert all(b["aa"].shape[0] == 2 for b in batches)
    it.close()


def test_fasta_renumber_strip(tmp_path, rng):
    from pepflowww_tpu.data.pdb import get_fasta_from_pdb, renumber_pdb, strip_to_backbone

    item = make_complex(rng, pep_len=6, rec_len=9)
    path = str(tmp_path / "c.pdb")
    save_pdb(item, path)
    fasta = get_fasta_from_pdb(path)
    assert set(fasta) == {"A", "B"}
    assert len(fasta["A"]) + len(fasta["B"]) == 15

    shifted = dict(item)
    shifted["resseq"] = item["resseq"] + 100
    renum = renumber_pdb(shifted)
    assert renum["resseq"].min() == 1

    bb = strip_to_backbone(item)
    assert bb["mask_heavyatom"][:, :4].any()
    assert not bb["mask_heavyatom"][:, 4:].any()


def test_loader_length_bucketing():
    """Bucketed batching groups by length: every batch pads only to its own
    bucket, padding waste stays bounded, and the compiled-shape count is
    bounded by the bucket list (VERDICT r1 item 4)."""
    from pepflowww_tpu.data.collate import DEFAULT_BUCKETS
    from pepflowww_tpu.data.dataset import DataLoader

    # PepMerge-like: pocket sizes vary widely (peptide 3-25 + pocket).
    rng = np.random.default_rng(0)
    lens = rng.integers(20, 150, size=256)

    class FakeDS:
        def __len__(self):
            return len(lens)

        def __getitem__(self, i):
            return {"aa": np.full(int(lens[i]), 7, dtype=np.int64), "id": str(i)}

    def measure(loader):
        padded = real = 0
        shapes = set()
        seen = []
        for b in loader:
            padded += b["aa"].size
            real += int(b["res_mask"].sum())
            shapes.add(b["aa"].shape)
            seen.extend(int(a[m].mean()) for a, m in zip(b["aa"], b["res_mask"]))
        return padded / real - 1.0, shapes

    mixed = DataLoader(FakeDS(), batch_size=8, shuffle=True, seed=0,
                       bucket_by_length=False)
    bucketed = DataLoader(FakeDS(), batch_size=8, shuffle=True, seed=0)
    w_mixed, s_mixed = measure(mixed)
    w_bucket, s_bucket = measure(bucketed)
    assert w_bucket < w_mixed / 2, (w_bucket, w_mixed)
    assert w_bucket < 0.25, w_bucket
    assert len(s_bucket) <= len(DEFAULT_BUCKETS)
    # Every batch's max item length actually fits its bucket tightly: the
    # bucket chosen is the smallest that fits.
    for pad_to, idxs in DataLoader(FakeDS(), batch_size=8, seed=1)._batch_plan():
        assert max(lens[i] for i in idxs) <= pad_to
        assert bucket_length(max(int(lens[i]) for i in idxs)) == pad_to


def test_loader_bucketing_shard_determinism():
    """All shards derive the same batch plan (same shapes at the same step)
    and partition each global batch without overlap."""
    from pepflowww_tpu.data.dataset import DataLoader

    rng = np.random.default_rng(3)
    lens = rng.integers(20, 120, size=64)

    class FakeDS:
        def __len__(self):
            return len(lens)

        def __getitem__(self, i):
            return {"aa": np.full(int(lens[i]), 3, dtype=np.int64), "id": str(i)}

    loaders = [
        DataLoader(FakeDS(), batch_size=2, shuffle=True, seed=5,
                   num_shards=2, shard_index=s)
        for s in range(2)
    ]
    b0, b1 = list(loaders[0]), list(loaders[1])
    assert len(b0) == len(b1) > 0
    for x, y in zip(b0, b1):
        assert x["aa"].shape == y["aa"].shape  # lock-step shapes
        assert x["aa"].shape[0] == 2
