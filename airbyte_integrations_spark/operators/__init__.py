from airbyte_integrations_spark.operators.asof import asof_join  # noqa: F401
from airbyte_integrations_spark.operators.dedup import (  # noqa: F401
    winner_agg,
    winner_salted,
    winner_window,
)
