"""andl_spark.operators"""
