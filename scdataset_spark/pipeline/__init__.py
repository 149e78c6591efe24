from scdataset_spark.pipeline.hooks import run_hook_pipeline  # noqa: F401
from scdataset_spark.pipeline.multiindexable import MultiIndexable  # noqa: F401
from scdataset_spark.pipeline.export import iterate_batches  # noqa: F401
