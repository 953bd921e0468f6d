"""Device-mesh utilities and sharding helpers.

Three scaling axes (the reference has one — DDP, train_ddp.py:79-94):
`mesh` (data parallel), `tp` (pair-row tensor parallel on a 2-D mesh),
`fsdp` (ZeRO-3-style params + optimizer-state sharding).
"""

from pepflowww_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
from pepflowww_tpu.parallel.fsdp import make_fsdp_train_step  # noqa: F401
from pepflowww_tpu.parallel.tp import make_mesh_2d, tp_shard  # noqa: F401
