from scdataset_spark.operators.strategies import (  # noqa: F401
    Streaming,
    BlockShuffling,
    BlockWeightedSampling,
    ClassBalancedSampling,
)
