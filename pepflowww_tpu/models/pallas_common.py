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


#: Fallback tiles may exceed the per-width row budget by at most this factor.
#: Calibrated against the one measured overflow: a 2048-row tile at CZ=128
#: (2x its 1024-row budget) breached the 16 MB scoped-vmem limit by 3%
#: (PERF.md round-3 scaling probe), so 1.5x keeps ~25% headroom below the
#: known failure point while still admitting e.g. L=160 at CZ=128 (1280 rows).
HARD_BUDGET_FACTOR = 1.5

_fallback_warned: set = set()


def pick_row_tile(L: int, budget_rows: int = 2048) -> "int | None":
    """Row-tile size k_i for the pair kernels' (.., k_i, L)-shaped blocks,
    or None when no Mosaic-legal tile fits the VMEM budget.

    Mosaic requires every block dim to be divisible by 8 (sublane) or equal
    to the full array dim — the old "largest divisor of L under the VMEM
    budget" rule violated that at L=160 (largest divisor <= 2048/160 is 10;
    found by the round-3 rehearsal's ragged validation batch, which was the
    first on-chip visit to that bucket). Pick the largest divisor of L that
    is a multiple of 8 (or L itself) within the row budget; fall back to the
    smallest multiple-of-8 divisor as long as it stays within
    HARD_BUDGET_FACTOR of the budget (ADVICE r3: the unconditional fallback
    silently re-created the exact tile size that overflowed scoped VMEM at
    wide channels x large L). Beyond that there is no legal tile: return
    None — callers take their XLA path for that shape (correct, slower) and
    warn once."""
    budget = max(1, budget_rows // L)
    cands = [d for d in range(1, min(L, budget) + 1)
             if L % d == 0 and (d % 8 == 0 or d == L)]
    if cands:
        return max(cands)
    cands = [d for d in range(1, L + 1) if L % d == 0 and d % 8 == 0]
    k = min(cands) if cands else L
    if k * L > HARD_BUDGET_FACTOR * budget_rows:
        return None
    return k


def edge_row_tile(L: int, CZ: int) -> "int | None":
    """Row tile for the EdgeTransition kernels at pair width CZ (shared by
    the forward/backward entry points and the EdgeTransition pre-check)."""
    return pick_row_tile(L, budget_rows=max(256, 2048 * 64 // CZ))


def dist_row_tile(L: int, F: int) -> "int | None":
    """Row tile for the EdgeEmbedder distance kernels at feature width F."""
    return pick_row_tile(L, budget_rows=max(256, 2048 * 64 // max(F, 64)))


def warn_no_tile(kernel: str, L: int, width: int) -> None:
    """Log (once per shape) that a fused kernel fell back to the XLA graph."""
    key = (kernel, L, width)
    if key not in _fallback_warned:
        _fallback_warned.add(key)
        import logging

        logging.getLogger(__name__).warning(
            "%s: no Mosaic-legal row tile fits the VMEM budget at L=%d "
            "width=%d — using the XLA graph for this shape (correct, slower)",
            kernel, L, width,
        )
