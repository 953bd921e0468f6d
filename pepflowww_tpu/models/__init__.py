"""Neural network: featurizers, IPA trunk, flow model (flax.linen)."""

from pepflowww_tpu.models.flow import FlowModel, FlowModelConfig  # noqa: F401
