from airbyte_integrations_spark.destinations.jdbc import (  # noqa: F401
    JdbcDestination,
    JdbcDestinationConfig,
)
