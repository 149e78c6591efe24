from scdataset_spark.sources.hf_sparse import densify_sparse_rows  # noqa: F401
from scdataset_spark.sources.synthetic_cells import SyntheticCellsDataSource  # noqa: F401
