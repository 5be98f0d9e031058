from copula_var_tpu.utils.artifacts import load_artifacts, save_artifacts
from copula_var_tpu.utils.profiling import StageTimer, trace_to

__all__ = ["save_artifacts", "load_artifacts", "StageTimer", "trace_to"]
