"""Device-mesh utilities and sharding helpers."""

from pepflowww_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
