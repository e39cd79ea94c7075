from galah_tpu.cluster.cache import SortedPairDistanceCache  # noqa: F401
from galah_tpu.cluster.union_find import DisjointSet  # noqa: F401
from galah_tpu.cluster.greedy import cluster  # noqa: F401
