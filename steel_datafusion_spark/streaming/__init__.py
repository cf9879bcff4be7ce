"""Structured Streaming surface (beyond-reference extension)."""
from .operators import *  # noqa: F401,F403
