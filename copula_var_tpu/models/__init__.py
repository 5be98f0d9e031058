from copula_var_tpu.models import garch, msm, ukf

__all__ = ["garch", "msm", "ukf"]
