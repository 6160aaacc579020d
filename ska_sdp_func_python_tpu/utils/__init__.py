"""Math/coordinate utilities (framework L1)."""

from .coordinates import *  # noqa: F401,F403
from .arrays import *  # noqa: F401,F403
from .geometry import *  # noqa: F401,F403
from .qa import qa_image, qa_gain_table, qa_visibility  # noqa: F401
from .profiling import timer, metrics, reset_metrics, profile_trace  # noqa: F401
