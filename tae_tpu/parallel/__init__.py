from tae_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    is_main_process,
    make_mesh,
)
from tae_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    constrain_batch,
    param_shardings,
    shard_params,
)
