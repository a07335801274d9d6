from fenix_spark.functions.metrics import METRICS, distance, dot, l2_distance, norm, query_literal, vec_double

__all__ = ["METRICS", "distance", "dot", "l2_distance", "norm", "query_literal", "vec_double"]
