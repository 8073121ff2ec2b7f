from lucene_spark.model.pymodel import PyIndex, Hit

__all__ = ["PyIndex", "Hit"]
