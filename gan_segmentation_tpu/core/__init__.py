from .dtypes import DTypePolicy, default_policy
from .mesh import make_mesh, data_sharding, replicated_sharding, kvstore_to_mesh
