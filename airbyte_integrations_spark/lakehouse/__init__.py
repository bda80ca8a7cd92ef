from airbyte_integrations_spark.lakehouse.table import LakeTable  # noqa: F401
from airbyte_integrations_spark.lakehouse.merge import merge_into  # noqa: F401
