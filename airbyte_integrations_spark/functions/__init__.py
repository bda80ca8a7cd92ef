from airbyte_integrations_spark.functions.bloom import build_bloom, might_contain  # noqa: F401
from airbyte_integrations_spark.functions.extract import extract_text, extract_text_py  # noqa: F401
from airbyte_integrations_spark.functions.hashing import surrogate_key, unique_key_scd  # noqa: F401
