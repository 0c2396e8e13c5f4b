from .mesh import make_tile_mesh, tile_sharding  # noqa: F401
