"""andl_spark.streaming"""
