from translator_ingests_spark.cdc.apply import CdcEngine, EVENT_SCHEMA, BASE_FIELDS
from translator_ingests_spark.cdc.generator import generate_event_log

__all__ = ["CdcEngine", "EVENT_SCHEMA", "BASE_FIELDS", "generate_event_log"]
