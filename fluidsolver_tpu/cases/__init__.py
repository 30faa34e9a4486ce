from fluidsolver_tpu.cases.registry import Case, get_case, list_cases, register

__all__ = ["Case", "get_case", "list_cases", "register"]
