from awskinesisconsumer_spark.plans.flagship import flagship_pipeline

__all__ = ["flagship_pipeline"]
