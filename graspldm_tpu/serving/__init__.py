from .batcher import BatcherStats, DynamicBatcher
from .export import (
    export_program,
    load_exported,
    make_ldm_program,
    make_vae_program,
    save_exported,
)
from .server import (
    GraspServer,
    make_batch_generate,
    make_batch_generate_from_parts,
)

__all__ = [
    "BatcherStats",
    "DynamicBatcher",
    "GraspServer",
    "export_program",
    "load_exported",
    "make_batch_generate",
    "make_batch_generate_from_parts",
    "make_ldm_program",
    "make_vae_program",
    "save_exported",
]
