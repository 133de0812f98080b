"""andl_spark.pipeline"""
