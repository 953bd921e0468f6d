"""Metric tests: RMSD/AAR/TM-score invariants."""

import numpy as np

from pepflowww_tpu import metrics as M


def test_rmsd_zero_on_identical():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 20, 3)).astype(np.float32)
    mask = np.ones((2, 20))
    np.testing.assert_allclose(M.ca_rmsd(x, x, mask), 0.0, atol=1e-6)
    np.testing.assert_allclose(M.ca_rmsd_aligned(x, x, mask), 0.0, atol=1e-4)


def test_rmsd_aligned_removes_rigid_motion():
    import jax
    from pepflowww_tpu.ops import so3

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 30, 3)).astype(np.float32) * 3
    R = np.asarray(so3.uniform_so3(jax.random.PRNGKey(0), (1,)))
    y = np.einsum("bij,bnj->bni", R, x) + 5.0
    mask = np.ones((1, 30))
    assert M.ca_rmsd(x, y, mask)[0] > 1.0
    assert M.ca_rmsd_aligned(x, y, mask)[0] < 1e-3


def test_aar_and_seq_diff():
    a = np.array([[1, 2, 3, 4]])
    b = np.array([[1, 2, 0, 0]])
    mask = np.ones((1, 4))
    np.testing.assert_allclose(M.amino_acid_recovery(a, b, mask), [0.5])
    np.testing.assert_allclose(M.seq_diff_ratio(a, b, mask), [0.5])
    # masked positions ignored
    mask2 = np.array([[1, 1, 0, 0]])
    np.testing.assert_allclose(M.amino_acid_recovery(a, b, mask2), [1.0])


def test_tm_score_range():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 25, 3)).astype(np.float32) * 4
    mask = np.ones((1, 25))
    assert M.tm_score(x, x, mask)[0] > 0.999
    y = rng.normal(size=(1, 25, 3)).astype(np.float32) * 4
    s = M.tm_score(x, y, mask)[0]
    assert 0.0 < s < 0.8


def test_binding_site_ratio():
    rec = np.zeros((1, 10, 3), dtype=np.float32)
    rec[0, :, 0] = np.arange(10) * 8.0  # residues spaced 8 Å along x
    pep = np.zeros((1, 3, 3), dtype=np.float32)  # peptide at origin
    rec_mask = np.ones((1, 10))
    pep_mask = np.ones((1, 3))
    ratio = M.binding_site_ratio(pep, pep_mask, rec, rec_mask, pep)
    np.testing.assert_allclose(ratio, [1.0])
    far = pep + np.array([200.0, 0, 0], dtype=np.float32)
    ratio2 = M.binding_site_ratio(far, pep_mask, rec, rec_mask, pep)
    assert ratio2[0] == 0.0


def test_ramachandran_ss():
    from pepflowww_tpu.evalharness import ramachandran_ss, ss_recovery

    phi = np.radians(np.array([-60.0, -120.0, 60.0]))
    psi = np.radians(np.array([-45.0, 130.0, 40.0]))
    ss = ramachandran_ss(phi, psi, np.ones(3))
    assert ss == ["H", "E", "C"]
    assert ss_recovery(ss, ss) == 1.0
    assert ss_recovery(ss, ["H", "H", "H"]) == 1 / 3


def test_summarize_outputs(tmp_path):
    import csv

    from pepflowww_tpu.metrics import summarize_outputs, summarize_outputs_csv

    rows = []
    for cid, rmsds, aars in (("a", [1.5, 3.0, 6.0], [0.5, 0.25, 0.25]),
                             ("b", [7.0, 9.0, 4.9], [0.1, 0.2, 0.3])):
        for i, (r, aa) in enumerate(zip(rmsds, aars)):
            rows.append({"id": cid, "sample": i, "ca_rmsd": r + 1.0,
                         "ca_rmsd_aligned": r, "aar": aa, "tm_score": 0.1 * i})
    s = summarize_outputs(rows)
    assert s["per_complex"]["a"]["best_rmsd"] == 1.5
    assert s["per_complex"]["a"]["median_rmsd"] == 3.0
    assert abs(s["per_complex"]["a"]["mean_aar"] - 1.0 / 3) < 1e-9
    assert s["overall"]["num_complexes"] == 2
    assert s["overall"]["success_rate_2A"] == 0.5   # only 'a' beats 2 A
    assert s["overall"]["success_rate_5A"] == 1.0

    path = tmp_path / "outputs.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    s2 = summarize_outputs_csv(str(path))
    assert s2["overall"] == s["overall"]
