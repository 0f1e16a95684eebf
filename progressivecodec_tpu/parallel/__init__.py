from progressivecodec_tpu.parallel.mesh import make_mesh, shard_params_rule
from progressivecodec_tpu.parallel.sharding import make_sharded_train_step

__all__ = ["make_mesh", "shard_params_rule", "make_sharded_train_step"]
