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
from ton_indexer_spark.operators.graph import connected_components, forest_roots
from ton_indexer_spark.operators.trace_assembly import assemble_traces
from ton_indexer_spark.operators.balances import (
    jetton_balance_changes,
    ton_balance_changes,
)
from ton_indexer_spark.operators.skew import salted_join
from ton_indexer_spark.operators.token_events import (
    derive_jetton_burns,
    derive_jetton_transfers,
)

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
    "forest_roots",
    "assemble_traces",
    "ton_balance_changes",
    "jetton_balance_changes",
    "salted_join",
    "derive_jetton_transfers",
    "derive_jetton_burns",
]
