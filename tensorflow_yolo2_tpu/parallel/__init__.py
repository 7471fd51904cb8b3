from tensorflow_yolo2_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    batch_sharding,
    make_mesh,
    replicate,
    shard_params,
)
