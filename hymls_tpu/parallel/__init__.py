from .mesh import set_mesh, get_mesh, shard_batch, make_mesh

__all__ = ["set_mesh", "get_mesh", "shard_batch", "make_mesh"]
