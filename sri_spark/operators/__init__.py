from sri_spark.operators.keys import add_surrogate_key, add_surrogate_key_scalable

__all__ = ["add_surrogate_key", "add_surrogate_key_scalable"]
