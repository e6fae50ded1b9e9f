from hugegraph_computer_spark.functions.expressions import predicate

__all__ = ["predicate"]
