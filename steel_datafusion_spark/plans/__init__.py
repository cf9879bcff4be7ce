"""Plan introspection."""
from .explain import df_explain, explain_string  # noqa: F401
