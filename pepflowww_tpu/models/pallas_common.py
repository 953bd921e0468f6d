"""Shared plumbing for the Pallas kernels.

`resolve_interpret` lets every kernel entry point take `interpret=None`
("auto"): compiled Mosaic on TPU, interpreter elsewhere. This is what makes
the flagship bf16+pallas graph runnable on the virtual-CPU meshes used by
tests and the driver's multi-chip dryrun — the same model config works on
both backends without callers threading platform knowledge around.

Known limitation (ADVICE r2): the "auto" choice keys off
`jax.default_backend()` — a process-wide property — not the device the
computation is actually placed on. In a TPU process, a pallas-bearing graph
explicitly pinned to the CPU backend (e.g. under
`jax.default_device(cpu_dev)`) would still attempt Mosaic compilation and
fail. No in-repo caller does this (host-pinned work — preprocessing,
evaluate_sample — never enters the kernels); callers that need it must pass
`interpret=True` explicitly. jax currently offers no trace-time handle on
the placement device, so auto-resolution from the sharding is not
implementable here.
"""

from __future__ import annotations


def resolve_interpret(interpret):
    if interpret is None:
        import jax

        return jax.default_backend() != "tpu"
    return bool(interpret)


def pick_row_tile(L: int, budget_rows: int = 2048) -> int:
    """Row-tile size k_i for the pair kernels' (.., k_i, L)-shaped blocks.

    Mosaic requires every block dim to be divisible by 8 (sublane) or equal
    to the full array dim — the old "largest divisor of L under the VMEM
    budget" rule violated that at L=160 (largest divisor <= 2048/160 is 10;
    found by the round-3 rehearsal's ragged validation batch, which was the
    first on-chip visit to that bucket). Pick the largest divisor of L that
    is a multiple of 8 (or L itself) within the row budget; fall back to the
    smallest multiple-of-8 divisor, then to L (full-dim blocks are always
    legal)."""
    budget = max(1, budget_rows // L)
    cands = [d for d in range(1, min(L, budget) + 1)
             if L % d == 0 and (d % 8 == 0 or d == L)]
    if cands:
        return max(cands)
    cands = [d for d in range(1, L + 1) if L % d == 0 and d % 8 == 0]
    return min(cands) if cands else L
