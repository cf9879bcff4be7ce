"""Function constructors."""
from .aggregates import *  # noqa: F401,F403
from .windows import *  # noqa: F401,F403
