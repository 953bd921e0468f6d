"""Manifold math, frame algebra, and all-atom geometry ops (pure JAX)."""

from pepflowww_tpu.ops import so3, torus, simplex, frames, dihedrals, allatom  # noqa: F401
