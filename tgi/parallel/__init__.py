from tgi.parallel.mesh import (make_mesh, shard_batch, replicate,
                               data_sharding, ray_sharding,
                               ray_constrained, constrain_ray_axis)
