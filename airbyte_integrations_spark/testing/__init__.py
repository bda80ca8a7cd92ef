from airbyte_integrations_spark.testing.acceptance import (  # noqa: F401
    SourceAcceptance,
)
