"""Shared plumbing for the Pallas kernels.

`resolve_interpret` lets every kernel entry point take `interpret=None`
("auto"): compiled Mosaic on TPU, interpreter elsewhere. This is what makes
the flagship bf16+pallas graph runnable on the virtual-CPU meshes used by
tests and the driver's multi-chip dryrun — the same model config works on
both backends without callers threading platform knowledge around.
"""

from __future__ import annotations


def resolve_interpret(interpret):
    if interpret is None:
        import jax

        return jax.default_backend() != "tpu"
    return bool(interpret)
