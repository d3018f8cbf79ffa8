from .sharding import make_mesh, shard_params, param_pspecs

__all__ = ["make_mesh", "shard_params", "param_pspecs"]
