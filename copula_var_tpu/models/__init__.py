from copula_var_tpu.models import garch

__all__ = ["garch"]
