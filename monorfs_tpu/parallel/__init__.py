from . import mesh  # noqa: F401
from .mesh import make_mesh, make_sharded_step, shard_state  # noqa: F401
from . import dist_ba  # noqa: F401
from . import chain  # noqa: F401
from . import multihost  # noqa: F401
