"""Multi-chip parallelism: device meshes, GSPMD data-parallel training,
time-sharded HPSS with ppermute halo exchange."""

from .distributed import (initialize_from_env, per_process_seed,  # noqa: F401
                          process_file_shard)
from .dp import make_dp_train_step, replicate, shard_batch  # noqa: F401
from .frontend_shard import (featuregram_time_sharded,  # noqa: F401
                             stft_hpss_mel_time_sharded)
from .halo import hpss_time_sharded  # noqa: F401
from .mesh import (batch_sharding, make_mesh, model_sharding,  # noqa: F401
                   replicated, time_sharding)
