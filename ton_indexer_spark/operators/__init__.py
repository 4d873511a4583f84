"""Generic relational operators (SURVEY.md §2).

Each helper is a thin, composable wrapper over DataFrame primitives so
Catalyst keeps full visibility (pushdown, pruning, join selection).  Nothing
here drops to RDDs; the only Python-side execution in the whole engine lives
in the classifier and multimodal UDFs.
"""

from ton_indexer_spark.operators.filters import (
    filter_by_array,
    filter_range,
)
from ton_indexer_spark.operators.pagination import paginate
from ton_indexer_spark.operators.windows import (
    first_per_group,
    latest_by,
    ordered_collect,
    with_prev_pointer,
)
from ton_indexer_spark.operators.pivots import inout_pivot
from ton_indexer_spark.operators.topk import top_k
from ton_indexer_spark.operators.sessionize import sessionize_by_gap
from ton_indexer_spark.operators.graph import connected_components

__all__ = [
    "filter_by_array",
    "filter_range",
    "paginate",
    "first_per_group",
    "latest_by",
    "ordered_collect",
    "with_prev_pointer",
    "inout_pivot",
    "top_k",
    "sessionize_by_gap",
    "connected_components",
]
