"""Multi-chip parallelism: device meshes, GSPMD data-parallel training,
time-sharded HPSS with ppermute halo exchange."""

from .dp import make_dp_train_step, replicate, shard_batch  # noqa: F401
from .halo import hpss_time_sharded  # noqa: F401
from .mesh import batch_sharding, make_mesh, replicated, time_sharding  # noqa: F401
