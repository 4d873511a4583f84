"""In-engine TVM interpreter (get-method subset) — see engine.py."""

from ton_indexer_spark.tvm.engine import (  # noqa: F401
    NAN,
    VM,
    VmError,
    VmHalt,
    VmTuple,
)
from ton_indexer_spark.tvm.run import (  # noqa: F401
    ComputePhaseResult,
    GetMethodResult,
    build_external_message,
    build_internal_message,
    method_id,
    parse_actions,
    run_compute_phase,
    run_compute_phase_external,
    run_get_method,
    smart_contract_info,
    stack_address,
    stack_cell,
    stack_int,
    to_v2_stack,
)
