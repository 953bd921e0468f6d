"""DSSP output parsing and secondary-structure range utilities.

Mirrors the API of the reference's `pepflow/modules/protein/dssp.py`
(secondary_struct_symbol_to_index, parse_dssp_file, find_sstruct_ranges,
find_loop_fragments) without Biopython: a standalone parser for classic
`mkdssp` output plus range helpers over per-chain SS strings.

SS alphabet (8-state DSSP): H G I (helix), E B (strand), T S - (other).
Index mapping matches the reference: coil/other -> 0, helix -> 1, strand -> 2.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

HELIX = set("HGI")
STRAND = set("EB")


def secondary_struct_symbol_to_index(s: str) -> int:
    if s in HELIX:
        return 1
    if s in STRAND:
        return 2
    return 0


def make_dssp_dict(handle) -> Dict[str, list]:
    """Parse an mkdssp stream into {chain_id: [(resseq, icode, aa, ss), ...]}."""
    chains: Dict[str, list] = {}
    started = False
    for line in handle:
        if line.startswith("  #  RESIDUE"):
            started = True
            continue
        if not started or len(line) < 17:
            continue
        if line[13] == "!":
            continue  # chain break
        try:
            resseq = int(line[5:10])
        except ValueError:
            continue
        icode = line[10]
        chain_id = line[11]
        aa = line[13]
        ss = line[16] if line[16] != " " else "-"
        chains.setdefault(chain_id, []).append((resseq, icode, aa, ss))
    return chains


def parse_dssp_file(path: str) -> Dict[str, list]:
    with open(path) as f:
        return make_dssp_dict(f)


def chain_ss_string(chain_entries: list) -> str:
    return "".join(e[3] for e in chain_entries)


def find_sstruct_ranges(chain_entries: list, min_length: int = 5) -> List[Tuple[int, int, int]]:
    """Contiguous helix/strand segments as (start, end_exclusive, ss_index)."""
    out = []
    idxs = [secondary_struct_symbol_to_index(e[3]) for e in chain_entries]
    i = 0
    n = len(idxs)
    while i < n:
        if idxs[i] == 0:
            i += 1
            continue
        j = i
        while j < n and idxs[j] == idxs[i]:
            j += 1
        if j - i >= min_length:
            out.append((i, j, idxs[i]))
        i = j
    return out


def find_loop_fragments(chain_entries: list, min_length: int = 3,
                        max_length: float = float("inf")) -> List[Tuple[int, int]]:
    """Contiguous coil segments with length in [min_length, max_length]."""
    out = []
    idxs = [secondary_struct_symbol_to_index(e[3]) for e in chain_entries]
    i = 0
    n = len(idxs)
    while i < n:
        if idxs[i] != 0:
            i += 1
            continue
        j = i
        while j < n and idxs[j] == 0:
            j += 1
        if min_length <= (j - i) <= max_length:
            out.append((i, j))
        i = j
    return out
