from saragan_tpu.parallel.mesh import (  # noqa: F401
    aot_with_options,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_global_batch,
    jit_train_step,
)
