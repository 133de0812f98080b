"""andl_spark.sources"""
