from .registry import Query, all_queries, register  # noqa: F401

# Importing these modules populates the registry.
from . import flagship  # noqa: F401,E402
from ..operators import relational, joins, aggregates, window_functions, setops  # noqa: F401,E402
from ..operators import llm, multimodal  # noqa: F401,E402
from ..functions import scalar, udfs  # noqa: F401,E402
from ..sources import cdc  # noqa: F401,E402
from ..streaming import event_time, jobs  # noqa: F401,E402
from . import warehouse, analytics, sql_api, lakehouse  # noqa: F401,E402
