from fiber_tpu.parallel.mesh import (create_mesh, data_sharding,  # noqa: F401
                                     replicated_sharding)
from fiber_tpu.parallel.itc_queue import ItcQueue  # noqa: F401
