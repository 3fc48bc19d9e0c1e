"""Device-mesh parallelism (SPMD over ICI).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(trainer/base_trainer.py:75). The TPU-native equivalent (SURVEY.md §2.3):
a 1-D mesh over all chips, batch-sharded inputs, replicated parameters, and
XLA-inserted all-reduces for gradients under ``jit``.
"""

from arflow_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_hybrid_mesh,
    initialize_multihost,
    dp_axes,
    shard_batch,
    replicate,
    batch_sharding,
)
from arflow_tpu.parallel.spatial import (  # noqa: F401
    make_spatial_mesh,
    shard_images_spatial,
    spatial_apply,
    spatial_image_sharding,
)
