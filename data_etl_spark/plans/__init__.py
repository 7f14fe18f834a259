"""Query-plan registry: importing this package registers every query."""

from .registry import (  # noqa: F401
    CAPPED_QUERIES,
    REGISTRY,
    Query,
    register,
    register_cap,
)

# Import for registration side effects (order = SURVEY.md §7 build phases).
from . import relational  # noqa: E402,F401
from . import documents  # noqa: E402,F401
from . import figures  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import textstats  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import streaming_plans  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import sinks  # noqa: E402,F401

__all__ = ["CAPPED_QUERIES", "REGISTRY", "Query", "register", "register_cap"]
