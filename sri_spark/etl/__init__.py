from sri_spark.etl.config import EtlConfig
from sri_spark.etl.pipeline import run_pipeline

__all__ = ["EtlConfig", "run_pipeline"]
