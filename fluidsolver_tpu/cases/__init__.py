from fluidsolver_tpu.cases.registry import Case, get_case, list_cases, register
import fluidsolver_tpu.cases.dfg  # noqa: F401  (registers the DFG cases)
import fluidsolver_tpu.cases.sources  # noqa: F401  (growing IB, expanding bubble)
import fluidsolver_tpu.cases.immersed_interface  # noqa: F401  (marker II case)

__all__ = ["Case", "get_case", "list_cases", "register"]
