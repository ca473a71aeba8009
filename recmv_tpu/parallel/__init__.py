from .mesh import make_mesh, pad_to_devices, ray_sharding, replicated, shard_rays
