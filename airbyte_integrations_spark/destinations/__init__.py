from airbyte_integrations_spark.destinations.jdbc import (  # noqa: F401
    JdbcDestination,
    JdbcDestinationConfig,
)
from airbyte_integrations_spark.destinations.files import (  # noqa: F401
    FilesDestination,
    FilesDestinationConfig,
)
