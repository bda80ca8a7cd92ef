from airbyte_integrations_spark.streaming.microbatch import plan_epochs, run_sync  # noqa: F401
