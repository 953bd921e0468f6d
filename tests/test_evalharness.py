"""Eval-harness parser tests (no external binaries needed)."""

import os

import pytest

from pepflowww_tpu import evalharness as E


def test_parse_tm_output():
    sample = """
 *********************************************************************
Name of Chain_1: model.pdb
Aligned length=   12, RMSD=   1.23, Seq_ID=n_identical/n_aligned= 0.500
TM-score= 0.71234 (if normalized by length of Chain_1)
TM-score= 0.69 (if normalized by length of Chain_2)
"""
    out = E._parse_tm(sample)
    assert out["tm_score"] == pytest.approx(0.71234)
    assert out["rmsd"] == pytest.approx(1.23)


def test_tool_unavailable_raises(monkeypatch, tmp_path):
    monkeypatch.setenv("TMALIGN_PATH", str(tmp_path / "nope"))
    with pytest.raises(E.ToolUnavailable):
        E.tm_align("a.pdb", "b.pdb")
    monkeypatch.delenv("TMALIGN_PATH")
    monkeypatch.setenv("PATH", str(tmp_path))
    with pytest.raises(E.ToolUnavailable):
        E.tm_score("a.pdb", "b.pdb")
    with pytest.raises(E.ToolUnavailable):
        E.scwrl4_pack("a.pdb", "b.pdb")
    with pytest.raises(E.ToolUnavailable):
        E.rosetta_energy("a.pdb")
    with pytest.raises(E.ToolUnavailable):
        E.run_proteinmpnn("a", "b")


def test_dssp_assign_parses_classic_format(tmp_path, monkeypatch):
    fake_out = (
        "  #  RESIDUE AA STRUCTURE\n"
        "    1    1 A M  H  ...\n"
        "    2    2 A K  E  ...\n"
        "    3        !       \n"
        "    4    3 A L     ...\n"
    )
    script = tmp_path / "mkdssp"
    script.write_text(f"#!/bin/sh\ncat <<'EOT'\n{fake_out}EOT\n")
    script.chmod(0o755)
    monkeypatch.setenv("DSSP_PATH", str(script))
    ss = E.dssp_assign("whatever.pdb")
    assert ss == "HE-"


# ---------------------------------------------------------------- fixtures
def _two_chain_pdb(tmp_path, rng=None):
    import numpy as np

    from pepflowww_tpu.data.pdb import save_pdb
    from pepflowww_tpu.data.synthetic import make_complex

    rng = rng or np.random.default_rng(0)
    item = make_complex(rng, pep_len=5, rec_len=9)  # chains B (pocket) + A (pep)
    path = tmp_path / "complex.pdb"
    save_pdb(item, str(path))
    return str(path)


_FAKE_PY = (
    "import sys, json, os\n"
    "log = os.environ['FAKE_LOG']\n"
    "with open(log, 'a') as f:\n"
    "    f.write(json.dumps([os.path.basename(sys.argv[0])] + sys.argv[1:]) + '\\n')\n"
)


def _read_log(path):
    import json

    with open(path) as f:
        return [json.loads(line) for line in f]


def test_chain_helpers(tmp_path):
    pdb = _two_chain_pdb(tmp_path)
    lens = E.chain_lengths(pdb)
    assert lens == {"A": 5, "B": 9}
    nums = E.chain_residue_numbers(pdb, "A")
    assert len(nums) == 5 and all(isinstance(n, int) for n in nums)


def test_run_proteinmpnn_fixed_positions_pipeline(tmp_path, monkeypatch):
    """The full parse/assign/fixed-positions protocol (eval/run_mpnn.py:26-71)
    reaches the runner with receptor-fixed redesign wiring."""
    helpers = tmp_path / "helper_scripts"
    helpers.mkdir()
    for name in ("parse_multiple_chains.py", "assign_fixed_chains.py",
                 "make_fixed_positions_dict.py"):
        (helpers / name).write_text(_FAKE_PY)
    runner = tmp_path / "protein_mpnn_run.py"
    runner.write_text(_FAKE_PY)
    log = tmp_path / "calls.jsonl"
    monkeypatch.setenv("FAKE_LOG", str(log))
    monkeypatch.setenv("PROTEINMPNN_PATH", str(runner))

    gt = _two_chain_pdb(tmp_path)
    out = tmp_path / "out"
    E.run_proteinmpnn(str(tmp_path / "pdbs"), str(out), chains_to_design="A",
                      num_seqs=4, gt_pdb=gt)

    calls = {c[0]: c[1:] for c in _read_log(log)}
    assert set(calls) == {"parse_multiple_chains.py", "assign_fixed_chains.py",
                          "make_fixed_positions_dict.py", "protein_mpnn_run.py"}
    fixed_args = calls["make_fixed_positions_dict.py"]
    assert "--specify_non_fixed" in fixed_args
    pos = fixed_args[fixed_args.index("--position_list") + 1]
    assert pos == " ".join(map(str, E.chain_residue_numbers(gt, "A")))
    run_args = calls["protein_mpnn_run.py"]
    for flag in ("--jsonl_path", "--chain_id_jsonl", "--fixed_positions_jsonl",
                 "--out_folder", "--num_seq_per_target", "--sampling_temp",
                 "--seed", "--batch_size"):
        assert flag in run_args, flag
    assert run_args[run_args.index("--num_seq_per_target") + 1] == "4"
    assert run_args[run_args.index("--fixed_positions_jsonl") + 1].endswith(
        "fixed_pdbs.jsonl")

    # pep_len fallback (run_mpnn.py:85-88): positions 1..pep_len
    log.unlink()
    E.run_proteinmpnn(str(tmp_path / "pdbs"), str(out), chains_to_design="A",
                      pep_len=6)
    calls2 = {c[0]: c[1:] for c in _read_log(log)}
    fx = calls2["make_fixed_positions_dict.py"]
    assert fx[fx.index("--position_list") + 1] == "1 2 3 4 5 6"


def test_run_esmif_argument_surface(tmp_path, monkeypatch):
    runner = tmp_path / "sample_sequences.py"
    runner.write_text(_FAKE_PY)
    log = tmp_path / "calls.jsonl"
    monkeypatch.setenv("FAKE_LOG", str(log))
    monkeypatch.setenv("ESMIF_RUNNER", str(runner))
    out = E.run_esmif("pocket.pdb", str(tmp_path / "esms" / "out.fasta"),
                      chain="A", num_samples=7, temperature=0.2)
    (call,) = _read_log(log)
    assert call[1] == "pocket.pdb"
    for flag, val in (("--chain", "A"), ("--temperature", "0.2"),
                      ("--num-samples", "7"), ("--outpath", out)):
        assert call[call.index(flag) + 1] == val
    assert "--multichain-backbone" in call and "--nogpu" in call


def test_run_esmfold_folds_fasta(tmp_path, monkeypatch):
    """Functional wrapper: with an importable `esm`, every fasta record is
    folded via infer_pdb and written out (eval/run_esmfold.py:23-45)."""
    import sys as _sys
    import types

    class FakeModel:
        def eval(self):
            return self

        def to(self, device):
            return self

        def infer_pdb(self, seq):
            return f"ATOM  fake fold of {seq}\nEND\n"

    fake = types.ModuleType("esm")
    fake.pretrained = types.SimpleNamespace(esmfold_v1=lambda: FakeModel())
    monkeypatch.setattr(E, "_ESMFOLD_MODEL", None)
    monkeypatch.setitem(_sys.modules, "esm", fake)

    fasta = tmp_path / "seqs.fasta"
    fasta.write_text(">s1\nACDEF\n>s2\nGHIKL\nMNPQR\n")
    written = E.run_esmfold(str(fasta), str(tmp_path / "refold"))
    assert [os.path.basename(p) for p in written] == ["s1.pdb", "s2.pdb"]
    assert "GHIKLMNPQR" in open(written[1]).read()


def test_run_rfdiffusion_contigs(tmp_path, monkeypatch):
    exe = tmp_path / "run_inference.py"
    exe.write_text("#!/usr/bin/env python3\n" + _FAKE_PY)
    exe.chmod(0o755)
    log = tmp_path / "calls.jsonl"
    monkeypatch.setenv("FAKE_LOG", str(log))
    monkeypatch.setenv("RFDIFFUSION_PATH", str(exe))
    pocket = _two_chain_pdb(tmp_path)
    E.run_rfdiffusion(pocket, str(tmp_path / "rfs" / "sample"), pep_len=5,
                      num_designs=3)
    (call,) = _read_log(log)
    contig_arg = [a for a in call if a.startswith("contigmap.contigs")][0]
    assert contig_arg == "contigmap.contigs=[A1-5/0 B1-9/0 5-5]"
    assert "inference.num_designs=3" in call


def test_run_protein_generator_contigs(tmp_path, monkeypatch):
    script = tmp_path / "inference.py"
    script.write_text(_FAKE_PY)
    log = tmp_path / "calls.jsonl"
    monkeypatch.setenv("FAKE_LOG", str(log))
    monkeypatch.setenv("PROTEIN_GENERATOR_PATH", str(script))
    pocket = _two_chain_pdb(tmp_path)
    E.run_protein_generator(pocket, str(tmp_path / "pgs" / "sample"),
                            pep_len=5, num_designs=2)
    (call,) = _read_log(log)
    i = call.index("--contigs")
    assert call[i + 1:] == ["A1-5,0", "B1-9,0", "5-5"]
    assert "--save_best_plddt" in call


def test_missing_tools_raise(monkeypatch, tmp_path):
    for var in ("ESMIF_RUNNER", "PROTEIN_GENERATOR_PATH", "PROTEINMPNN_PATH",
                "RFDIFFUSION_PATH"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("PATH", str(tmp_path))
    with pytest.raises(E.ToolUnavailable):
        E.run_esmif("a.pdb", "b.fasta")
    with pytest.raises(E.ToolUnavailable):
        E.run_protein_generator("a.pdb", "o", 5)
    with pytest.raises(E.ToolUnavailable):
        E.run_rfdiffusion("a.pdb", "o", 5)
