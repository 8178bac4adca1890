"""Driver contract for the graft builder (Ray Data target).

entry(): flagship token feature stack on /root/testdata/sf0.001.
queries(): one entry per implemented operator/pipeline from SURVEY.md §2.
oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in featureengineer_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from featureengineer_ray.pipelines import token_feature_stack

    return token_feature_stack("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from featureengineer_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from featureengineer_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
