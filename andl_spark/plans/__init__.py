"""andl_spark.plans"""
