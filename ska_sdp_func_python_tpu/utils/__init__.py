"""Math/coordinate utilities (framework L1)."""

from .coordinates import *  # noqa: F401,F403
from .arrays import *  # noqa: F401,F403
from .geometry import *  # noqa: F401,F403
