from fluidsolver_tpu.cases.registry import Case, get_case, list_cases, register
import fluidsolver_tpu.cases.dfg  # noqa: F401  (registers the DFG cases)
import fluidsolver_tpu.cases.sources  # noqa: F401  (growing IB, expanding bubble)

__all__ = ["Case", "get_case", "list_cases", "register"]
