"""Operators package."""
from .relational import *  # noqa: F401,F403
from .describe import df_describe  # noqa: F401
