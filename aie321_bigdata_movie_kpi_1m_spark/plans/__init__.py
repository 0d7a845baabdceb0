"""Plans package: importing it populates the query catalog."""

from . import catalog
from . import relational  # noqa: F401  (registers queries)

CATALOG = catalog.CATALOG

__all__ = ["CATALOG", "catalog", "relational"]
