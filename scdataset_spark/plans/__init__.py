from scdataset_spark.plans.seeds import mix_sql, mix_col, MIX_MOD  # noqa: F401
from scdataset_spark.plans.plan import (  # noqa: F401
    with_pos,
    with_batches,
    ddp_filter,
    exact_num_batches,
)
