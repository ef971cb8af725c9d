"""Query library — import every plan module so registration side-effects
run, then expose the registry."""

from .registry import REGISTRY, QuerySpec, query

from . import staging      # noqa: F401  (P1–P5, Q1–Q7)
from . import dims         # noqa: F401  (dim_time, SCD2)
from . import facts        # noqa: F401  (fact builds, upserts)
from . import analytics    # noqa: F401  (metric tables + views)
from . import tpch         # noqa: F401  (bench / multi-join queries)
from . import events       # noqa: F401  (event analytics)
from . import windows      # noqa: F401  (moving frames, rollup, pivot, percentiles)
from . import extensions   # noqa: F401  (dedup / similarity / text / multimodal)
from . import pipeline_queries  # noqa: F401  (end-to-end e-commerce pipeline)

__all__ = ["REGISTRY", "QuerySpec", "query"]
