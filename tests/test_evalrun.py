"""evalrun.py orchestrator: walks a real sample.py-layout directory, scores
with whatever tools resolve (fakes here, as in test_evalharness), degrades
gracefully when binaries are absent, and writes the CSV + summary artifacts.
"""

import csv
import json
import os
import stat
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def sample_tree(tmp_path_factory):
    """structure_dir with 2 native complexes + samples_dir with 2 'generated'
    samples each (the native complex re-saved — geometry is irrelevant to the
    orchestration logic under test)."""
    from pepflowww_tpu.data.collate import mask_select_data
    from pepflowww_tpu.data.pdb import save_pdb
    from pepflowww_tpu.data.synthetic import make_complex

    root = tmp_path_factory.mktemp("evalrun")
    structs, samples = root / "structs", root / "samples"
    rng = np.random.default_rng(5)
    for i in range(2):
        cid = f"cplx_{i}"
        item = make_complex(rng, pep_len=6, rec_len=10, complex_id=cid)
        sdir = structs / cid
        sdir.mkdir(parents=True)
        save_pdb(mask_select_data(item, item["generate_mask"]),
                 str(sdir / "peptide.pdb"))
        save_pdb(mask_select_data(item, ~item["generate_mask"]),
                 str(sdir / "pocket.pdb"))
        odir = samples / cid
        odir.mkdir(parents=True)
        for s in range(2):
            save_pdb(item, str(odir / f"sample_{s}.pdb"))
    return str(structs), str(samples)


def _run(args, env=None):
    e = dict(os.environ)
    e.update(env or {})
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "evalrun.py")] + args,
        capture_output=True, text=True, timeout=600, cwd=ROOT, env=e)


def test_evalrun_tool_free_fallback(sample_tree):
    """With no external binaries at all: ss (Ramachandran fallback) runs,
    tm/foldx/... are recorded as unavailable, artifacts are written."""
    structs, samples = sample_tree
    out = os.path.join(samples, "eval_nofake")
    r = _run(["--samples_dir", samples, "--structure_dir", structs,
              "--out", out],
             env={"PATH": "/usr/bin:/bin", "TMALIGN_PATH": "/nonexistent"})
    assert r.returncode == 0, r.stderr[-2000:]

    summary = json.load(open(os.path.join(out, "eval_summary.json")))
    assert summary["tools"]["tm"].startswith("unavailable")
    assert summary["tools"]["ss"] == "ok"
    assert summary["num_rows"] == 4
    # samples ARE the natives, so SS recovery must be perfect
    assert summary["means"]["ss_recovery"] == pytest.approx(1.0)

    with open(os.path.join(out, "eval_outputs.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    assert all(float(r["ss_recovery"]) == 1.0 for r in rows)


def test_evalrun_with_fake_tmalign(sample_tree, tmp_path):
    """A resolving TMalign binary feeds tm_score/rmsd columns into the
    summarize_outputs paper tables."""
    structs, samples = sample_tree
    fake = tmp_path / "TMalign"
    fake.write_text(
        "#!/bin/sh\n"
        "echo 'Aligned length=   6, RMSD=   1.50, Seq_ID=n_identical/n_aligned= 1.000'\n"
        "echo 'TM-score= 0.82000 (if normalized by length of Chain_1)'\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    out = os.path.join(samples, "eval_fake")
    r = _run(["--samples_dir", samples, "--structure_dir", structs,
              "--out", out, "--tools", "tm,ss", "--max_samples", "1"],
             env={"TMALIGN_PATH": str(fake)})
    assert r.returncode == 0, r.stderr[-2000:]

    summary = json.load(open(os.path.join(out, "eval_summary.json")))
    assert summary["tools"]["tm"] == "ok"
    tables = summary["tables"]
    assert tables["overall"]["num_complexes"] == 2
    assert tables["overall"]["avg_best_rmsd"] == pytest.approx(1.5)
    assert tables["overall"]["avg_mean_tm_score"] == pytest.approx(0.82)
