"""Query-time preprocessors: diffusion gates, autocorrect."""

from .autocorrect import COMMON_TYPOS, smart_correct  # noqa: F401
from .diffusion import compute_diffusion_gates  # noqa: F401
