"""pepflowww_tpu — TPU-native full-atom peptide design via multi-modal flow matching.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Ced3-han/PepFlowww (ICML 2024, arXiv:2406.00735): joint flow matching of
backbone rigid frames (SO(3) x R^3), side-chain torsions (flat torus T^5) and
sequence (logit simplex) conditioned on a receptor binding pocket.

Layout:
    constants   — chemical tables (AA enum, 15-atom layout, rigid groups)
    ops         — manifold math, frame algebra, all-atom reconstruction
    models      — featurizers + IPA trunk + flow model (flax.linen) + kernels
    sampling    — jit'd Euler-ODE sampler (lax.scan over timesteps)
    training    — loss, optax optimizer, plateau scheduler, checkpoints
    parallel    — device-mesh utilities, data-parallel train step
    data        — PDB parse/write, record store, dataset, collate, synthetic
    metrics     — RMSD/AAR/TM-score; evalharness — external-tool wrappers
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing jax at package import).
    if name == "FlowModel":
        from pepflowww_tpu.models.flow import FlowModel

        return FlowModel
    if name == "FlowModelConfig":
        from pepflowww_tpu.models.flow import FlowModelConfig

        return FlowModelConfig
    if name == "euler_sample":
        from pepflowww_tpu.sampling import euler_sample

        return euler_sample
    if name == "load_torch_checkpoint":
        from pepflowww_tpu.convert import load_torch_checkpoint

        return load_torch_checkpoint
    raise AttributeError(name)
