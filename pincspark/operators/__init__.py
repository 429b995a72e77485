from pincspark.operators.asof import asof_join  # noqa: F401
from pincspark.operators.keyed import (  # noqa: F401
    latest_per_key,
    sessionize,
    validity_intervals,
)
from pincspark.operators.normalize import union_normalize  # noqa: F401
