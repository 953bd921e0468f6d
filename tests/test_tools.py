"""Tests for offline tooling: dataset construction, splits, data helpers, dssp."""

import io
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from pepflowww_tpu.data.collate import find_longest_true_segment, mask_select_data
from pepflowww_tpu.data.pdb import save_pdb
from pepflowww_tpu.data.synthetic import make_complex


def test_find_longest_true_segment():
    m = np.array([0, 1, 1, 0, 1, 1, 1, 0], dtype=bool)
    out = find_longest_true_segment(m)
    np.testing.assert_array_equal(out, [0, 0, 0, 0, 1, 1, 1, 0])
    assert not find_longest_true_segment(np.zeros(4, dtype=bool)).any()


def test_mask_select_data(rng):
    item = make_complex(rng, pep_len=5, rec_len=7)
    mask = item["generate_mask"]
    sub = mask_select_data(item, mask)
    assert len(sub["aa"]) == 5
    assert len(sub["chain_id"]) == 5
    assert sub["pos_heavyatom"].shape[0] == 5


def test_make_dataset_pocket_extraction(tmp_path, rng):
    from make_dataset import process

    item = make_complex(rng, pep_len=6, rec_len=30)
    pdb_path = str(tmp_path / "complex.pdb")
    save_pdb(item, pdb_path)
    ok = process("cx", pdb_path, "A", str(tmp_path / "out"), cutoff=15.0)
    assert ok
    assert os.path.exists(tmp_path / "out" / "cx" / "peptide.pdb")
    assert os.path.exists(tmp_path / "out" / "cx" / "pocket.pdb")
    from pepflowww_tpu.data.pdb import parse_pdb

    pep, _ = parse_pdb(str(tmp_path / "out" / "cx" / "peptide.pdb"))
    assert len(pep["aa"]) == 6


def test_make_splits_greedy_clustering(rng):
    from make_splits import cluster_greedy

    seqs = {
        "a1": "ACDEFGHIKLMNPQRSTVWY" * 3,
        "a2": "ACDEFGHIKLMNPQRSTVWY" * 3,  # identical -> same cluster
        "b1": "WYWYWYWYWYWYWYWYWYWY" * 3,
    }
    rep = cluster_greedy(seqs, 0.4, 0.8)
    assert rep["a2"] == rep["a1"]
    assert rep["b1"] != rep["a1"]


def test_dssp_parser():
    from pepflowww_tpu.data.dssp import (
        find_loop_fragments,
        find_sstruct_ranges,
        make_dssp_dict,
        secondary_struct_symbol_to_index,
    )

    fake = io.StringIO(
        "  #  RESIDUE AA STRUCTURE\n"
        "    1    1 A M  H\n"
        "    2    2 A K  H\n"
        "    3    3 A L  H\n"
        "    4    4 A V  H\n"
        "    5    5 A A  H\n"
        "    6    6 A G     \n"
        "    7    7 A S     \n"
        "    8    8 A T     \n"
        "    9    9 A E  E\n"
        "   10   10 A F  E\n"
    )
    chains = make_dssp_dict(fake)
    assert list(chains) == ["A"]
    entries = chains["A"]
    assert len(entries) == 10
    assert secondary_struct_symbol_to_index("H") == 1
    ranges = find_sstruct_ranges(entries, min_length=3)
    assert (0, 5, 1) in ranges
    loops = find_loop_fragments(entries, min_length=3)
    assert (5, 8) in loops


def test_index_select_and_patch(rng):
    import numpy as np
    from pepflowww_tpu.data.collate import (
        apply_patch_to_tensor,
        index_select_data,
    )

    item = make_complex(rng, pep_len=4, rec_len=6)
    sub = index_select_data(item, np.array([0, 2, 4]))
    assert len(sub["aa"]) == 3
    assert len(sub["chain_id"]) == 3

    x = np.zeros((5, 2))
    patched = apply_patch_to_tensor(x, np.ones((2, 2)), np.array([1, 3]))
    assert patched[1].sum() == 2 and patched[3].sum() == 2 and patched[0].sum() == 0
    assert x.sum() == 0  # original untouched
