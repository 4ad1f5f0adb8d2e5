"""Aggregated query registry: importing this module registers every
catalog entry (core reference surface, ETL pipeline, extensions)."""

from . import catalog, catalog_agg, catalog_etl, catalog_ext, catalog_win  # noqa: F401
from .catalog import ORACLES, QUERIES  # noqa: F401
