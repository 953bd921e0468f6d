"""PDB file IO — dependency-free (no Biopython in this image).

`parse_pdb` reproduces the semantics of the reference parser
(`pepflow/modules/protein/parsers.py:47-160` in Ced3-han/PepFlowww):

* chains sorted by chain id; residues sorted by (resseq, icode)
* non-standard residues remapped onto canonical parents; non-AA skipped
* residues lacking any of N/CA/C skipped; UNK residues counted then skipped
* heavy atoms scattered into the 15-slot per-restype layout
* `res_nb` renumbering inserts gaps when consecutive CA–CA distance > 4 Å
* returns (data, seq_map) or (None, None) for empty/all-unknown structures

`save_pdb` mirrors `pepflow/modules/protein/writers.py:10-88`: one chain per
unique chain_nb, atoms emitted per the restype layout, masked atoms omitted.
"""

from __future__ import annotations

import numpy as np

from pepflowww_tpu import constants as C


def _parse_atom_line(line: str):
    name = line[12:16].strip()
    altloc = line[16]
    resname = line[17:20].strip()
    chain_id = line[21]
    resseq = int(line[22:26])
    icode = line[26]
    x = float(line[30:38])
    y = float(line[38:46])
    z = float(line[46:54])
    return name, altloc, resname, chain_id, resseq, icode, (x, y, z)


def parse_pdb_atoms(path_or_str: str):
    """Group ATOM records of the first model by chain and residue.

    Returns {chain_id: {(resseq, icode): {"resname": str, "atoms": {name: xyz}}}}.
    """
    if "\n" in path_or_str:
        lines = path_or_str.splitlines()
    else:
        with open(path_or_str) as f:
            lines = f.read().splitlines()

    chains: dict = {}
    for line in lines:
        rec = line[:6]
        if rec == "ENDMDL":
            break  # first model only
        if rec not in ("ATOM  ", "HETATM"):
            continue
        if len(line) < 54:
            continue
        try:
            name, altloc, resname, chain_id, resseq, icode, xyz = _parse_atom_line(line)
        except ValueError:
            continue
        if altloc not in (" ", "A"):
            continue  # keep primary conformer
        res = chains.setdefault(chain_id, {}).setdefault(
            (resseq, icode), {"resname": resname, "atoms": {}}
        )
        res["atoms"].setdefault(name, np.asarray(xyz, dtype=np.float32))
    return chains


def parse_pdb(path: str, unknown_threshold: float = 1.0):
    """Parse a PDB file into the preprocessed-item schema (numpy dict)."""
    chains = parse_pdb_atoms(path)

    data = {
        "chain_id": [], "chain_nb": [], "resseq": [], "icode": [], "res_nb": [],
        "aa": [], "pos_heavyatom": [], "mask_heavyatom": [],
    }
    count_aa, count_unk = 0, 0

    for i, chain_id in enumerate(sorted(chains.keys())):
        seq_this = 0
        residues = sorted(chains[chain_id].items(), key=lambda kv: (kv[0][0], kv[0][1]))
        for (resseq, icode), res in residues:
            resname = res["resname"]
            if not C.AA.is_aa(resname):
                continue
            atoms = res["atoms"]
            if not ("CA" in atoms and "C" in atoms and "N" in atoms):
                continue
            restype = C.AA(resname)
            count_aa += 1
            if restype == C.AA.UNK:
                count_unk += 1
                continue

            pos15 = np.zeros((C.MAX_NUM_HEAVYATOMS, 3), dtype=np.float32)
            mask15 = np.zeros((C.MAX_NUM_HEAVYATOMS,), dtype=bool)
            for idx, atom_name in enumerate(C.HEAVYATOM_NAMES[int(restype)]):
                if atom_name == "" or atom_name not in atoms:
                    continue
                pos15[idx] = atoms[atom_name]
                mask15[idx] = True

            data["chain_id"].append(chain_id)
            data["chain_nb"].append(i)
            data["aa"].append(int(restype))
            data["pos_heavyatom"].append(pos15)
            data["mask_heavyatom"].append(mask15)

            # Renumbering with CA-CA gap detection (parsers.py:126-137).
            if seq_this == 0:
                seq_this = 1
            else:
                d_ca_ca = float(
                    np.linalg.norm(
                        data["pos_heavyatom"][-2][C.BBHeavyAtom.CA]
                        - data["pos_heavyatom"][-1][C.BBHeavyAtom.CA]
                    )
                )
                if d_ca_ca <= 4.0:
                    seq_this += 1
                else:
                    d_resseq = resseq - data["resseq"][-1]
                    seq_this += max(2, d_resseq)

            data["resseq"].append(resseq)
            data["icode"].append(icode)
            data["res_nb"].append(seq_this)

    if len(data["aa"]) == 0:
        return None, None
    if count_aa > 0 and (count_unk / count_aa) >= unknown_threshold:
        return None, None

    seq_map = {
        (cid, rs, ic): idx
        for idx, (cid, rs, ic) in enumerate(
            zip(data["chain_id"], data["resseq"], data["icode"])
        )
    }

    out = {
        "chain_id": data["chain_id"],
        "icode": data["icode"],
        "chain_nb": np.asarray(data["chain_nb"], dtype=np.int64),
        "resseq": np.asarray(data["resseq"], dtype=np.int64),
        "res_nb": np.asarray(data["res_nb"], dtype=np.int64),
        "aa": np.asarray(data["aa"], dtype=np.int64),
        "pos_heavyatom": np.stack(data["pos_heavyatom"]),
        "mask_heavyatom": np.stack(data["mask_heavyatom"]),
    }
    return out, seq_map


def get_fasta_from_pdb(path: str) -> dict:
    """Per-chain one-letter sequences (parsers.py:163-179 / eval/utils.py)."""
    data, _ = parse_pdb(path)
    if data is None:
        return {}
    out: dict[str, str] = {}
    for cid, aa in zip(data["chain_id"], data["aa"]):
        out[cid] = out.get(cid, "") + C.RESINDEX_TO_RESSYMB.get(int(aa), "X")
    return out


def renumber_pdb(data: dict, start: int = 1) -> dict:
    """Renumber residues sequentially per chain (eval/utils.py renumber)."""
    out = dict(data)
    resseq = np.asarray(data["resseq"]).copy()
    chain_nb = np.asarray(data["chain_nb"])
    for ch in np.unique(chain_nb):
        idx = np.nonzero(chain_nb == ch)[0]
        resseq[idx] = np.arange(start, start + len(idx))
    out["resseq"] = resseq
    return out


def strip_to_backbone(data: dict) -> dict:
    """Keep only N/CA/C/O atoms (eval/utils.py backbone-strip)."""
    out = dict(data)
    mask = np.asarray(data["mask_heavyatom"]).copy()
    mask[:, 4:] = False
    out["mask_heavyatom"] = mask
    return out


_ELEMENT_OF = {"N": "N", "C": "C", "O": "O", "S": "S"}


def _atom_element(name: str) -> str:
    return _ELEMENT_OF.get(name[0], name[0])


def save_pdb(data: dict, path: str | None = None) -> str:
    """Write a structure dict to PDB format; returns the PDB text.

    Expects numpy fields aa/pos_heavyatom/mask_heavyatom/chain_nb/resseq and
    list fields chain_id/icode (same schema the parser emits).
    """
    aa = np.asarray(data["aa"])
    pos = np.asarray(data["pos_heavyatom"])
    mask = np.asarray(data["mask_heavyatom"])
    chain_nb = np.asarray(data["chain_nb"])
    resseq = np.asarray(data["resseq"])
    chain_ids = data.get("chain_id", ["A"] * len(aa))
    icodes = data.get("icode", [" "] * len(aa))

    lines = []
    serial = 1
    for ch in np.unique(chain_nb):
        idxs = np.nonzero(chain_nb == ch)[0]
        chain_letter = str(chain_ids[idxs[0]])[:1] or "A"
        for ri in idxs:
            restype = int(aa[ri])
            if restype >= C.NUM_AA_TYPES:
                continue
            resname = C.AA(restype).name
            for ai, atom_name in enumerate(C.HEAVYATOM_NAMES[restype]):
                if atom_name == "" or not mask[ri, ai]:
                    continue
                if len(atom_name) < 4:
                    fullname = f" {atom_name:<3s}"
                else:
                    fullname = atom_name
                x, y, z = pos[ri, ai]
                ic = str(icodes[ri])[:1] or " "
                lines.append(
                    f"ATOM  {serial:5d} {fullname}{'':1s}{resname:>3s} {chain_letter}"
                    f"{int(resseq[ri]):4d}{ic}   {x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}"
                    f"          {_atom_element(atom_name):>2s}"
                )
                serial += 1
        lines.append("TER")
    lines.append("END")
    text = "\n".join(lines) + "\n"
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text
