"""Plans package: importing it populates the query catalog."""

from . import catalog
from . import relational, textops, vectors  # noqa: F401  (register queries)

CATALOG = catalog.CATALOG

__all__ = ["CATALOG", "catalog", "relational", "textops", "vectors"]
