from fluidsolver_tpu.cases.registry import Case, get_case, list_cases, register
import fluidsolver_tpu.cases.dfg  # noqa: F401  (registers the DFG cases)

__all__ = ["Case", "get_case", "list_cases", "register"]
