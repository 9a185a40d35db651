from .deterministic import davg, dsum, dstd_samp, dvar_samp, dzscore_parts
from . import expressions

__all__ = ["davg", "dsum", "dstd_samp", "dvar_samp", "dzscore_parts", "expressions"]
