from kupo_spark.operators.indexer import Index, build_index  # noqa: F401
from kupo_spark.operators.fold_inputs import fold_inputs  # noqa: F401
