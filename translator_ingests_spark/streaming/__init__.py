from translator_ingests_spark.streaming.micro_batch import CdcStream

__all__ = ["CdcStream"]
