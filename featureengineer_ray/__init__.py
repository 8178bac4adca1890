"""featureengineer_ray — a Ray-Data-native feature-engineering engine.

Brand-new engine (not a port) with the query/data-processing capabilities of
the reference `YihengJiang/featureEngineer` (see SURVEY.md), re-expressed as
a point-in-time as-of join + windowed feature stack (backfill, lag/lead,
rolling aggregates, sessionize) over Parquet tables of pre-tokenized training
sequences, executed as ray.data.Dataset pipelines of map_batches over
zero-copy Arrow batches.

NOTE: nothing in this package calls ray.init()/ray.shutdown() — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
