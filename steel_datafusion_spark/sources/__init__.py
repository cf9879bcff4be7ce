"""Sources package."""
from .readers import *  # noqa: F401,F403
