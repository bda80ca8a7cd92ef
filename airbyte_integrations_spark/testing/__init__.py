from airbyte_integrations_spark.testing.acceptance import (  # noqa: F401
    SourceAcceptance,
)
from airbyte_integrations_spark.testing.destination_acceptance import (  # noqa: F401
    DestinationAcceptance,
)
