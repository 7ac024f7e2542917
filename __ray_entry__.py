"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse → match → enrich → correlate → route
pipeline over /root/testdata/sf0.001 and returns the routed alerts.
``queries()`` / ``oracle_sql()`` expose one entry per implemented
operator (SURVEY.md §2) with DuckDB-equivalent SQL.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in sagan_ray) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from sagan_ray.pipelines.flagship import alerts_pipeline, load_default_rules
    from sagan_ray.sources.webpages import webpages_from_documents

    ds = webpages_from_documents("/root/testdata/sf0.001", include_html=False)
    return alerts_pipeline(ds, load_default_rules(), enrich=True)


def queries() -> dict[str, Callable[[str], Any]]:
    from sagan_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sagan_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
