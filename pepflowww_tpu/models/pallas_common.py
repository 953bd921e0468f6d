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
