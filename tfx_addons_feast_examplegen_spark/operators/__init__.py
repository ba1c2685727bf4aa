from .pit_join import materialize_features, point_in_time_join  # noqa: F401
from .split import hash_split, split_counts  # noqa: F401
