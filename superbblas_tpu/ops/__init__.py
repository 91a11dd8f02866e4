from .copy import local_copy, local_permute
from .contract import local_contraction

__all__ = ["local_copy", "local_permute", "local_contraction"]
