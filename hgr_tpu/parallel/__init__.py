from .distributed import host_local_batch_slice, init_distributed
from .mesh import (
    DATA,
    MODEL,
    bank_sharded,
    batch_sharded,
    logits_sharded,
    make_mesh,
    replicated,
)

__all__ = [
    "DATA",
    "MODEL",
    "bank_sharded",
    "batch_sharded",
    "logits_sharded",
    "make_mesh",
    "replicated",
    "host_local_batch_slice",
    "init_distributed",
]
