"""Large-scale training-data pipeline operators (deduplication,
similarity search, text analysis, multimodal plumbing).

No reference analog in MobilityDB — these are the web-scale payload
operators the north rule pairs with the spatial engine.  Everything
follows the same execution discipline as the spatial side: built-in
Spark functions where possible (whole-stage codegen), Arrow-batched
pandas/numpy kernels where not, explicit skew handling on banded
self-joins.
"""

from . import dedup, similarity, text  # noqa: F401
