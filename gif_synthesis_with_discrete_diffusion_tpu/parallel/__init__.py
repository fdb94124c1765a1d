from .mesh import (create_mesh, shard_batch, replicate,  # noqa: F401
                   shard_state, DEFAULT_TP_RULES)
