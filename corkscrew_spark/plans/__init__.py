from . import queries  # noqa: F401  (must import first: defines the registry)
from . import graph_queries  # noqa: F401
from . import data_queries  # noqa: F401
from . import engine_queries  # noqa: F401
from . import ops_queries  # noqa: F401
from . import surface_queries  # noqa: F401
from . import analytics_queries  # noqa: F401
from . import kql_queries  # noqa: F401
from . import temporal_queries  # noqa: F401
