"""airbyte_integrations_spark — a from-scratch, PySpark-native CDC /
incremental-ingest engine with the sync semantics of
airbytecontributors/airbyte-integrations (reference at /root/reference,
cited by file:line in module docstrings).

The engine is Spark-first: declarative DataFrame plans, Catalyst-driven
pushdown/pruning, associative aggregation for skew-proof dedup, Arrow
pandas UDFs for the only non-relational step (html -> text extraction),
and a snapshot-based lake table format providing atomic commits, MERGE
semantics, schema evolution and an exactly-once epoch commit log.
"""

__version__ = "0.1.0"

from airbyte_integrations_spark.config import (  # noqa: F401
    DestinationSyncMode,
    SyncConfig,
    SyncMode,
)
from airbyte_integrations_spark.sources.jdbc import (  # noqa: F401
    JdbcSource,
    JdbcSourceConfig,
)
from airbyte_integrations_spark.streaming.microbatch import run_sync  # noqa: F401
from airbyte_integrations_spark.streaming.stream_sync import stream_sync  # noqa: F401
