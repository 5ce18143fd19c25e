from translator_ingests_spark.lake.table import LakeTable, LakeSchema, LakeField

__all__ = ["LakeTable", "LakeSchema", "LakeField"]
