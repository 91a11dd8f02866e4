from .copy import local_copy, local_permute
from .contract import local_contraction
from .reduce import label_sum, scal, select

__all__ = ["local_copy", "local_permute", "local_contraction",
           "label_sum", "scal", "select"]
