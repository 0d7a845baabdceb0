"""Plans package: importing it populates the query catalog."""

from . import catalog
from . import analytics, corpus_stats, media_stream, relational, textops, vectors, warehouse  # noqa: F401  (register queries)

CATALOG = catalog.CATALOG

__all__ = ["CATALOG", "catalog", "media_stream", "relational", "textops", "vectors"]
