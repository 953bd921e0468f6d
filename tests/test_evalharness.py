"""Eval-harness parser tests (no external binaries needed)."""

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
