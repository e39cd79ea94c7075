from galah_tpu.engines.base import (  # noqa: F401
    ClusterDistanceFinder,
    PreclusterDistanceFinder,
    QualityFinder,
    RrnaFinder,
    TrnaFinder,
)
