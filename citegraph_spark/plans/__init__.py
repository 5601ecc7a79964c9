from . import entry_queries

# Importing these modules registers their queries into
# entry_queries.QUERIES / ORACLES.
from . import analytics_queries  # noqa: E402,F401
from . import cleaning_queries  # noqa: E402,F401
from . import events_queries  # noqa: E402,F401
from . import graph_fixture_queries  # noqa: E402,F401
from . import graph_walk_queries  # noqa: E402,F401
from . import mlstats_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import relational_queries  # noqa: E402,F401
from . import storage_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import tpch_rest  # noqa: E402,F401

__all__ = ["entry_queries"]
