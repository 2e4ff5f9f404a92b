from .mesh import get_data_mesh, shard_batch_spec
