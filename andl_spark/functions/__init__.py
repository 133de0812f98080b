"""andl_spark.functions"""
