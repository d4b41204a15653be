from .registry import Query, all_queries, register  # noqa: F401

# Importing these modules populates the registry.
from . import flagship  # noqa: F401,E402
