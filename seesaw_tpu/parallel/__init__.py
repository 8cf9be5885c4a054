"""Multi-chip scaling: meshes, sharded scoring/top-k, data-parallel training.

The reference distributes with Ray actors (no collectives). Here scale comes
from `jax.sharding` over a device mesh: the embedding matrix is row-sharded
across chips, per-shard top-k candidates ride ICI through all-gather, and
tower fine-tuning is data-parallel with psum gradient reduction (SURVEY.md
§2.5, §5.8).
"""

from .mesh import make_mesh  # noqa: F401
from .sharded_index import ShardedFrameIndex, sharded_query_topk  # noqa: F401
from .sharded_graph import sharded_exact_knn, sharded_propagate  # noqa: F401
