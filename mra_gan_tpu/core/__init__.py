from .dtypes import Policy, get_policy
from .mesh import make_mesh, batch_sharding, replicated_sharding
