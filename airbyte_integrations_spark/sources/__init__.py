from airbyte_integrations_spark.sources.cdc import LogTailSource  # noqa: F401
from airbyte_integrations_spark.sources.incremental import read_incremental  # noqa: F401
